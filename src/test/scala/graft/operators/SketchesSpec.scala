package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SketchesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // Zipf-ish corpus: key k occurs ~30000/k times, plus a long tail of
  // singletons — heavy head, near-unique tail, the CMS target shape.
  private def longKeys = {
    val head = (1 to 30).flatMap(k => Seq.fill(30000 / k)(k.toLong))
    val tail = (100000L to 103000L)
    (head ++ tail).toDF("k")
  }

  test("heavyHitters equals the exact GROUP BY / HAVING on long keys") {
    for (t <- Seq(1500L, 5000L, 29000L)) {
      val got = Sketches.heavyHitters(longKeys, "k", t)
        .as[(Long, Long)].collect().toSet
      val want = longKeys.groupBy("k").agg(count(lit(1)).as("n"))
        .filter($"n" >= t).as[(Long, Long)].collect().toSet
      assert(got == want, s"minCount=$t")
    }
  }

  test("heavyHitters equals the exact answer on string keys") {
    val words = (1 to 20).flatMap(k => Seq.fill(2000 / k)(s"word$k")) ++
      (1 to 500).map(i => s"rare$i")
    val df = words.toDF("w")
    val got = Sketches.heavyHitters(df, "w", 300L)
      .as[(String, Long)].collect().toSet
    val want = df.groupBy("w").agg(count(lit(1)).as("n"))
      .filter($"n" >= 300).as[(String, Long)].collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("a coarse sketch still yields the exact answer (rescore prunes FPs)") {
    // eps 0.05 on a 30k-distinct-key corpus guarantees collisions: the
    // prefilter admits false positives, the exact rescore must drop
    // every one of them
    val df = ((1 to 5).flatMap(k => Seq.fill(4000)(k.toLong)) ++
      (1000000L to 1030000L)).toDF("k")
    val got = Sketches.heavyHitters(df, "k", 4000L, eps = 0.05)
      .as[(Long, Long)].collect().toSet
    assert(got == (1 to 5).map(k => (k.toLong, 4000L)).toSet)
  }

  test("probe never underestimates and returns 0 for null sketch or key") {
    val df = longKeys
    val sketch = df.agg(call_function("count_min_sketch",
      $"k", lit(1e-4), lit(0.99), lit(42)).as("s")).head.getAs[Array[Byte]](0)
    val est = df.distinct().select($"k",
        graft.functions.CmsProbe.of(sketch, $"k").as("est"))
      .as[(Long, Long)].collect().toMap
    val truth = df.groupBy("k").count().as[(Long, Long)].collect().toMap
    truth.foreach { case (k, n) => assert(est(k) >= n, s"key $k") }
    // null sketch and null key both probe 0, never null
    val zeros = Seq((Some(1L)), (None: Option[Long])).toDF("k")
      .select(
        graft.functions.CmsProbe.of(null, $"k").as("a"),
        graft.functions.CmsProbe.of(sketch, lit(null).cast("bigint")).as("b"))
      .as[(Long, Long)].collect()
    assert(zeros.forall(z => z._1 == 0L && z._2 == 0L))
  }

  test("probe + rescore spends exactly ONE shuffle (the rescore exchange)") {
    // the operator's contract at scale: the sketch rides in the
    // expression (no join, no broadcast), the probe filter is narrow,
    // and only the candidate groupBy exchanges
    val hh = Sketches.heavyHitters(longKeys, "k", 1500L)
    graft.audit.PlanGuard.assertNoCartesian(hh)
    graft.audit.PlanGuard.assertMaxExchanges(hh, 1)
    assert(hh.count() > 0)
  }

  test("a caller-owned cache survives heavyHitters (no unpersist theft)") {
    // Re-persisting an already-cached Dataset is a Spark no-op, so if
    // the operator unpersisted unconditionally it would free the
    // CALLER's cache entry. It must only free a cache it created.
    val df = longKeys.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      df.count()
      val got = Sketches.heavyHitters(df, "k", 1500L)
        .as[(Long, Long)].collect().toSet
      val want = df.groupBy("k").agg(count(lit(1)).as("n"))
        .filter($"n" >= 1500).as[(Long, Long)].collect().toSet
      assert(got == want)
      assert(df.storageLevel != org.apache.spark.storage.StorageLevel.NONE,
        "caller's cache was dropped by heavyHitters")
    } finally df.unpersist()
  }

  test("null keys are excluded; empty input yields empty output") {
    val withNulls = Seq(Some(1L), Some(1L), Some(1L), None, None, None, None)
      .toDF("k")
    val got = Sketches.heavyHitters(withNulls, "k", 2L)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 3L))) // the 4 nulls never form a group
    assert(Sketches.heavyHitters(longKeys.filter($"k" < 0), "k", 1L)
      .collect().isEmpty)
    intercept[IllegalArgumentException] {
      Sketches.heavyHitters(longKeys, "k", 0L)
    }
  }
}
