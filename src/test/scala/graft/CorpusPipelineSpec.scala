package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** End-to-end corpus pipeline invariants over the CorpusDemo chain:
  * each stage only removes rows, duplicates actually die at the right
  * stage, and the final pack plan stays valid.
  */
class CorpusPipelineSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"

  private def docs = Seq(
    (1L, base),
    (2L, base),                         // exact duplicate of 1
    (3L, base + " lambda"),             // near-dup of 1 (jaccard 10/11)
    (4L, base + " lambda mu"),          // near-dup chain
    (5L, "totally different words here about completely other topics now"),
    (6L, "aa aa aa aa aa aa aa aa aa aa aa aa")  // degenerate repetition
  ).toDF("doc_id", "text")

  test("quality gate drops the repetition-degenerate doc") {
    val toks = docs.select(col("doc_id"), col("text"),
      graft.text.TextOps.tokens(col("text")).as("toks"))
    val kept = toks.filter(graft.text.TextOps.dupTokenFrac(col("toks")) < 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("exact dedup keeps one of the identical pair; near-dup clustering collapses the chain") {
    val exact = operators.Dedup.exactDedup(docs, "doc_id", Seq("text"))
    val exactIds = exact.select("doc_id").as[Long].collect().toSet
    assert(exactIds == Set(1L, 3L, 4L, 5L, 6L)) // 2 dies (dup of 1)

    val pairs = dedup.NearDup.nearDupPairs(exact, "doc_id", "text",
      threshold = 0.6, shingleN = 1)
    val comps = operators.ConnectedComponents.components(
      pairs.select("id1", "id2"), "id1", "id2")
    val reps = operators.ConnectedComponents.keepRepresentatives(
      exact, "doc_id", comps).select("doc_id").as[Long].collect().toSet
    // 1,3,4 form one near-dup cluster -> representative 1; 5,6 singletons
    assert(reps == Set(1L, 5L, 6L))
  }

  test("pack plan over the survivors covers every doc exactly once") {
    val plan = operators.Pack.packPlan(docs, "doc_id",
      graft.text.TextOps.tokenCount(col("text")), nShards = 2, ctxTokens = 16)
    assert(plan.select("doc_id").distinct().count() == 6)
    val offs = plan.select("pack_offset").as[Long].collect()
    assert(offs.forall(o => o >= 0 && o < 16))
  }
}
