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

  test("histogramQuantiles lands within one bin width of the exact quantile") {
    val vals = (1 to 100000).map(i => (i * 37 % 99991).toDouble).toDF("v")
    val bins = 128
    val got = Sketches.histogramQuantiles(vals, "v", bins, Seq(0.5, 0.95, 0.99))
      .as[(Double, Double)].collect().toMap
    val exact = vals.agg(
      percentile(col("v"), lit(0.5)), percentile(col("v"), lit(0.95)),
      percentile(col("v"), lit(0.99))).as[(Double, Double, Double)]
      .collect().head
    val width = 99990.0 / bins
    assert(math.abs(got(0.5) - exact._1) <= width, s"$got vs $exact")
    assert(math.abs(got(0.95) - exact._2) <= width)
    assert(math.abs(got(0.99) - exact._3) <= width)
    // constant column short-circuits to the constant
    val const = Seq.fill(100)(7.5).toDF("v")
    val cq = Sketches.histogramQuantiles(const, "v", 16, Seq(0.5))
      .as[(Double, Double)].collect().head
    assert(cq == ((0.5, 7.5)))
  }

  test("histogram bin counts merge by addition under a shared frame") {
    val vals = (1 to 20000).map(i => (i % 1000).toDouble).toDF("v")
    // whole-corpus quantiles == quantiles of added per-split bin counts:
    // proven indirectly — split along a value-independent axis and check
    // the estimates agree (same (mn, mx, n) frame because both splits
    // span the full range)
    val q1 = Sketches.histogramQuantiles(vals, "v", 64, Seq(0.9))
      .as[(Double, Double)].collect().head
    val reordered = vals.orderBy(rand(42)).repartition(7)
    val q2 = Sketches.histogramQuantiles(reordered, "v", 64, Seq(0.9))
      .as[(Double, Double)].collect().head
    assert(q1 == q2) // layout/order independence of the whole pipeline
  }

  test("hllEstimate tracks the true cardinality within HLL error bounds") {
    // duplicates must not move the estimate: 3 copies of every key
    val n = 20000L
    val keys = (1L to n).flatMap(k => Seq(k, k, k)).toDF("k")
    val est = Sketches.hllEstimate(keys, "k", bucketBits = 8)
      .select("estimate").as[Double].collect().head
    // se ~ 1.04/sqrt(256) = 6.5%; 4 sigma = 26%
    assert(math.abs(est - n) / n < 0.26, s"est $est vs true $n")
    // more buckets, tighter: the m=64 default stays within its own 4sigma
    val est64 = Sketches.hllEstimate(keys, "k", bucketBits = 6)
      .select("estimate").as[Double].collect().head
    assert(math.abs(est64 - n) / n < 0.52, s"est64 $est64 vs true $n")
  }

  test("hll registers merge: union of split sketches == whole-corpus sketch") {
    val all = (1L to 5000L).toDF("k")
    val whole = Sketches.hllRegisters(all, "k")
      .as[(Long, Int)].collect().toMap
    val a = Sketches.hllRegisters(all.filter($"k" % 3 === 0), "k")
    val b = Sketches.hllRegisters(all.filter($"k" % 3 =!= 0), "k")
    val merged = a.unionByName(b).groupBy("bucket")
      .agg(max("r").as("r")).as[(Long, Int)].collect().toMap
    assert(merged == whole)
  }

  test("hll: null keys excluded; salt decorrelates; layout-independent") {
    val withNulls = (Seq[Option[Long]](None, None) ++
      (1L to 1000L).map(Some(_))).toDF("k")
    val plain = (1L to 1000L).toDF("k")
    val e1 = Sketches.hllEstimate(withNulls, "k").as[(Long, Long, Double)]
      .collect().head
    val e2 = Sketches.hllEstimate(plain, "k").as[(Long, Long, Double)]
      .collect().head
    assert(e1 == e2)
    val e3 = Sketches.hllEstimate(plain.repartition(13), "k")
      .as[(Long, Long, Double)].collect().head
    assert(e3 == e2)
    val salted = Sketches.hllEstimate(plain, "k", salt = "s2")
      .as[(Long, Long, Double)].collect().head
    assert(salted != e2) // independent draw, same algebra
    assert(math.abs(salted._3 - 1000.0) / 1000.0 < 0.52)
  }
}
