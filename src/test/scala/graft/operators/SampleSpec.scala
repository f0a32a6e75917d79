package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SampleSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ids = (1L to 10000L).toDF("id")

  test("hashSample keeps roughly the requested fraction, deterministically") {
    val kept = Sample.hashSample(ids, "id", permille = 250).as[Long].collect().toSet
    assert(math.abs(kept.size - 2500) < 250, s"kept ${kept.size}")
    val again = Sample.hashSample(ids.repartition(17), "id", permille = 250)
      .as[Long].collect().toSet
    assert(again == kept)
  }

  test("samples are nested: a 10% sample is a subset of the 30% sample") {
    val p100 = Sample.hashSample(ids, "id", 100).as[Long].collect().toSet
    val p300 = Sample.hashSample(ids, "id", 300).as[Long].collect().toSet
    assert(p100.subsetOf(p300))
  }

  test("mixtureSample hits the target mix at maximal volume") {
    val rows = (1L to 6000L).map { i =>
      (i, if (i % 6 < 3) "a" else if (i % 6 < 5) "b" else "c")
    }.toDF("id", "stratum") // counts: a=3000, b=2000, c=1000
    val out = Sample.mixtureSample(rows, "id", "stratum",
      Map("a" -> 0.5, "b" -> 0.25, "c" -> 0.25))
      .groupBy("stratum").count().as[(String, Long)].collect().toMap
    // c is the binding stratum: T = 1000/0.25 = 4000 -> targets
    // a=2000, b=1000, c=1000 (c keeps everything)
    assert(out("c") > 900)
    assert(math.abs(out("a") - 2000) < 200, out.toString)
    assert(math.abs(out("b") - 1000) < 150, out.toString)
  }

  test("mixtureSample keeps a stratum whose correct rate is below 1 permille") {
    // the boilerplate-downweighting case the permille floor broke: a
    // 100k-row stratum with target weight 0.0005 needs rate
    // 0.0005·T/100000 ≈ 0.0002 = 0.2‰ — floor(permille) = 0 silently
    // dropped the whole stratum; the ppm verdict keeps ~200 ppm of it
    val rows = ((1L to 100000L).map((_, "big")) ++
      (100001L to 140000L).map((_, "small"))).toDF("id", "stratum")
    val out = Sample.mixtureSample(rows, "id", "stratum",
      Map("big" -> 0.0005, "small" -> 0.9995))
      .groupBy("stratum").count().as[(String, Long)].collect().toMap
    // T = min(1e5/0.0005, 4e4/0.9995) ≈ 40020 -> big target ≈ 20 rows
    assert(out.contains("big"), s"sub-permille stratum dropped: $out")
    assert(out("big") > 0 && out("big") < 60, out.toString)
    assert(out("small") > 39000L, out.toString)
  }

  test("temperatureSample: alpha=1 keeps everything, alpha=0 equalizes, alpha=0.5 between") {
    val rows = (1L to 5000L).map { i =>
      (i, if (i % 5 < 4) "big" else "small")
    }.toDF("id", "stratum") // counts: big=4000, small=1000
    val all = Sample.temperatureSample(rows, "id", "stratum", alpha = 1.0)
    assert(all.count() == 5000)

    val eq = Sample.temperatureSample(rows, "id", "stratum", alpha = 0.0)
      .groupBy("stratum").count().as[(String, Long)].collect().toMap
    // alpha=0: every stratum sampled down to the smallest (1000)
    assert(eq("small") > 900)
    assert(math.abs(eq("big") - 1000) < 150, eq.toString)

    val half = Sample.temperatureSample(rows, "id", "stratum", alpha = 0.5)
      .groupBy("stratum").count().as[(String, Long)].collect().toMap
    // alpha=0.5: big keeps sqrt(1000/4000) = 50% -> ~2000 rows
    assert(half("small") > 900)
    assert(math.abs(half("big") - 2000) < 200, half.toString)
    // sampled share of big strictly between the alpha=0 and alpha=1 mixes
    assert(half("big") > eq("big") && half("big") < 4000)
  }

  test("temperatureSample is layout-independent") {
    val rows = (1L to 3000L).map(i => (i, (i % 3).toString)).toDF("id", "stratum")
    val a = Sample.temperatureSample(rows, "id", "stratum", 0.3)
      .select("id", "stratum").as[(Long, String)].collect().toSet
    val b = Sample.temperatureSample(rows.repartition(13), "id", "stratum", 0.3)
      .select("id", "stratum").as[(Long, String)].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("clusterSafeSplit keeps every near-dup cluster in one split") {
    // clusters: {1,2,3}, {10,11}, singletons 20..40
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id1", "id2")
    val docs = (Seq(1L, 2L, 3L, 10L, 11L) ++ (20L to 40L)).toDF("id")
    val got = Sample.clusterSafeSplit(docs, "id", edges,
        Seq("train" -> 800, "val" -> 100, "test" -> 100))
      .as[(Long, String)].collect().toMap
    assert(got.size == 26)
    // the leakage property: cluster members share one split
    assert(Set(got(1L), got(2L), got(3L)).size == 1)
    assert(got(10L) == got(11L))
    // singletons degenerate to plain hashSplit
    val plain = Sample.hashSplit((20L to 40L).toDF("id"), "id",
        Seq("train" -> 800, "val" -> 100, "test" -> 100))
      .as[(Long, String)].collect().toMap
    (20L to 40L).foreach(i => assert(got(i) == plain(i)))
    // and the cluster draws the REPRESENTATIVE's bucket
    assert(got(1L) == plain.getOrElse(1L,
      Sample.hashSplit(Seq(1L).toDF("id"), "id",
        Seq("train" -> 800, "val" -> 100, "test" -> 100))
        .as[(Long, String)].collect().head._2))
  }

  test("stratifiedHashSample honors fractional permille rates") {
    val rows = (1L to 100000L).map((_, "a")).toDF("id", "stratum")
    val kept = Sample.stratifiedHashSample(rows, "id", "stratum",
      Map("a" -> 0.5)).count() // 0.5 permille = 500 ppm -> ~50 rows
    assert(kept > 10 && kept < 100, s"kept $kept")
  }

  test("mixtureSample drops strata without a weight") {
    val rows = Seq((1L, "a"), (2L, "junk"), (3L, "a")).toDF("id", "stratum")
    val kept = Sample.mixtureSample(rows, "id", "stratum", Map("a" -> 1.0))
      .select("stratum").as[String].collect()
    assert(!kept.contains("junk"))
  }

  test("hashSplit is exhaustive, disjoint, near the target shares, and stable") {
    val ids = (1L to 10000L).toDF("id")
    val out = Sample.hashSplit(ids, "id",
      Seq("train" -> 800, "val" -> 100, "test" -> 100))
    val counts = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 10000L)               // exhaustive, one label each
    assert(math.abs(counts("train") - 8000) < 400, counts.toString)
    assert(math.abs(counts("val") - 1000) < 200, counts.toString)
    assert(math.abs(counts("test") - 1000) < 200, counts.toString)
    // rebuild-stable: the same id lands in the same split on a repartition
    val a = out.orderBy("id").collect().toSeq
    val b = Sample.hashSplit(ids.repartition(7), "id",
      Seq("train" -> 800, "val" -> 100, "test" -> 100)).orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("hashSplit stratifies independently of hashSample's bucket") {
    // with an UNseeded split this would put the whole sample in train
    val ids = (1L to 20000L).toDF("id")
    val sampled = Sample.hashSample(ids, "id", 100) // 10% by the raw bucket
    val counts = Sample.hashSplit(sampled, "id",
      Seq("train" -> 800, "val" -> 100, "test" -> 100))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    val n = counts.values.sum.toDouble
    assert(counts.getOrElse("val", 0L) > 0 && counts.getOrElse("test", 0L) > 0)
    assert(math.abs(counts("train") / n - 0.8) < 0.08, counts.toString)
  }

  test("composed samplers multiply rates; same-seed composition is the min(p,r) trap") {
    val ids = (1L to 50000L).toDF("id")
    // the failure mode first: two samplers deciding from the SAME
    // bucket intersect verdicts — keep 200‰ then 500‰ yields ~200‰
    // (min), not the ~100‰ independent composition would give
    val sameSeed = Sample.hashSample(
      Sample.hashSample(ids, "id", 200, seed = 1L), "id", 500, seed = 1L)
      .count()
    assert(math.abs(sameSeed - 10000L) < 500, s"min(p,r) trap: $sameSeed")
    // default seeds are distinct per sampler: hashSample ∘ hashSample'
    // (different seeds) and hashSample ∘ stratified/mixture all ≈ p·r
    val composed = Sample.hashSample(
      Sample.hashSample(ids, "id", 200), "id", 500, seed = 99991L).count()
    assert(math.abs(composed - 5000L) < 600, s"composed uniform: $composed")

    val strata = (1L to 50000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "stratum")
    val viaStrat = Sample.stratifiedHashSample(
      Sample.hashSample(strata, "id", 200), "id", "stratum",
      Map("a" -> 500, "b" -> 500)).count()
    assert(math.abs(viaStrat - 5000L) < 600, s"hash ∘ stratified: $viaStrat")

    // mixture over the ~5000/5000 sample with an 80/20 target: binding
    // stratum a keeps all ~5000, b must DOWNSAMPLE to ~1250 (permille
    // 250). A bucket correlated with hashSample's would keep ALL of b
    // (every sampled id already sits in the low buckets the 250‰ cut
    // selects) — the silent-proportions failure this family had
    val viaMixture = Sample.mixtureSample(
      Sample.hashSample(strata, "id", 200), "id", "stratum",
      Map("a" -> 0.8, "b" -> 0.2))
      .groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(math.abs(viaMixture("a") - 5000L) < 600, viaMixture.toString)
    assert(math.abs(viaMixture("b") - 1250L) < 300, viaMixture.toString)
  }

  test("hashSplit rejects shares that do not sum to 1000") {
    val ids = Seq(1L).toDF("id")
    intercept[IllegalArgumentException] {
      Sample.hashSplit(ids, "id", Seq("train" -> 900, "val" -> 99))
    }
  }
  test("mixtureSchedule: exact integer schedule, upsampling expressible") {
    val counts = Seq(("en", 800000L), ("fr", 50000L), ("xx", 999L))
      .toDF("source", "n_tokens")
    val got = Sample.mixtureSchedule(counts, "source", "n_tokens",
        weights = Map("en" -> 0.75, "fr" -> 0.25), budgetTokens = 1000000L)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // weights normalized over present sources; xx has no weight -> dropped
    assert(got.keySet == Set("en", "fr"))
    assert(got("en") == ((800000L, 750000L, 750000L, 937500L)))  // < 1 epoch
    assert(got("fr") == ((50000L, 250000L, 250000L, 5000000L)))  // 5 epochs
  }

  test("mixtureSchedule: zero-token sources dropped, huge budgets don't overflow") {
    // a 100-trillion-token budget: budget * weight_ppm = 1e14 * 5e5
    // = 5e19 > Long.MaxValue — the decimal-routed products must stay
    // exact where a Long intermediate would wrap negative
    val counts = Seq(("en", 2000000000000L), ("fr", 1000000000000L),
      ("empty", 0L)).toDF("source", "n_tokens")
    val got = Sample.mixtureSchedule(counts, "source", "n_tokens",
        weights = Map("en" -> 0.5, "fr" -> 0.5, "empty" -> 0.5),
        budgetTokens = 100000000000000L)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // the zero-token source is dropped BEFORE normalization: en/fr
    // split the whole budget 50/50 and its weight is not absorbed
    assert(got.keySet == Set("en", "fr"))
    assert(got("en") == ((2000000000000L, 500000L, 50000000000000L, 25000000L)))  // 25 epochs
    assert(got("fr") == ((1000000000000L, 500000L, 50000000000000L, 50000000L)))  // 50 epochs
  }

  test("budgetFill keeps a best-first prefix; the crossing row is included") {
    val docs = Seq((1L, 10L, 0.9), (2L, 10L, 0.5), (3L, 10L, 0.7),
      (4L, 10L, 0.2)).toDF("id", "n", "score")
    // score desc: 1(pre 0), 3(pre 10), 2(pre 20), 4(pre 30); budget 25
    // keeps 1,3 outright and 2 as the crossing row
    val got = Sample.budgetFill(docs, "id", "n", "score", 25L)
      .select("id", "cum_tokens_before")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 3L -> 10L, 2L -> 20L))
    // worst-first direction + id tiebreak on equal scores
    val tied = Seq((5L, 3L, 0.5), (6L, 3L, 0.5), (7L, 3L, 0.9))
      .toDF("id", "n", "score")
    val worst = Sample.budgetFill(tied, "id", "n", "score", 4L,
        bestFirst = false)
      .select("id").as[Long].collect().toSet
    assert(worst == Set(5L, 6L)) // 5 (pre 0), 6 (pre 3 crosses), 7 excluded
  }

  test("quotaPerStratum keeps the best k per stratum, WindowGroupLimit plan") {
    val rows = Seq(("a", 1L, 5L), ("a", 2L, 9L), ("a", 3L, 9L),
      ("b", 4L, 1L)).toDF("s", "id", "v")
    val out = Sample.quotaPerStratum(rows, "s", "v", 2,
      bestFirst = true, tiebreaks = Seq("id"))
    assert(out.select("id").as[Long].collect().toSet == Set(2L, 3L, 4L))
    // the rank filter must plan as a group-limit: map-side top-k per
    // stratum before the exchange, so a huge stratum never funnels
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
  }

  test("epochOrder is an exact 1..n permutation, stable across layouts") {
    val n = 10000L
    val e1 = Sample.epochOrder(ids, "id", epoch = 1)
      .as[(Long, Long)].collect().toMap
    assert(e1.values.toSet == (1L to n).toSet, "positions must be 1..n exactly")
    val again = Sample.epochOrder(ids.repartition(17), "id", epoch = 1)
      .as[(Long, Long)].collect().toMap
    assert(again == e1, "same epoch must give the identical order on any layout")
  }

  test("epochOrder epochs are decorrelated permutations, not rotations") {
    val e1 = Sample.epochOrder(ids, "id", epoch = 1).as[(Long, Long)].collect().toMap
    val e2 = Sample.epochOrder(ids, "id", epoch = 2).as[(Long, Long)].collect().toMap
    // fixed points of the relative permutation: ~n/n expected for a
    // random pair; a rotation/affine relative would align in runs
    val same = e1.count { case (id, p) => e2(id) == p }
    assert(same < 20, s"epochs 1 and 2 share $same positions of 10000")
    // the relative shift e2-e1 must not be (near-)constant: count the
    // most common shift value — an input-shifted hash family would put
    // almost all mass on one or two shifts (the measured hashMod2 trap)
    val topShift = e1.toSeq.groupBy { case (id, p) => e2(id) - p }
      .values.map(_.size).max
    assert(topShift < 100, s"dominant relative shift covers $topShift rows")
  }

  test("curriculumOrder ramps tiers and shuffles within each") {
    import org.apache.spark.sql.functions.col
    // difficulty = id itself: tier 1 must be ids 1..2500, tier 4
    // ids 7501..10000 (NTILE over 10000 rows, 4 tiers)
    val out = Sample.curriculumOrder(ids, "id", col("id"), buckets = 4,
        epoch = 5L)
      .select("id", "tier", "train_pos")
      .as[(Long, Long, Long)].collect()
    val byTier = out.groupBy(_._2)
    assert(byTier(1L).map(_._1).toSet == (1L to 2500L).toSet)
    assert(byTier(4L).map(_._1).toSet == (7501L to 10000L).toSet)
    // positions are dense 1..n and tier-monotone: every tier-1
    // position precedes every tier-2 position, etc.
    assert(out.map(_._3).toSet == (1L to 10000L).toSet)
    assert(byTier(1L).map(_._3).max < byTier(2L).map(_._3).min)
    assert(byTier(3L).map(_._3).max < byTier(4L).map(_._3).min)
    // within a tier the hash shuffle decorrelates: the id order and
    // the position order must disagree somewhere (probability of
    // accidental agreement ~ 1/2500!)
    val t1 = byTier(1L).sortBy(_._3).map(_._1).toSeq
    assert(t1 != t1.sorted)
    // a different epoch permutes within-tier order but not tiers
    val e2 = Sample.curriculumOrder(ids, "id", col("id"), buckets = 4,
        epoch = 6L)
      .select("id", "tier", "train_pos")
      .as[(Long, Long, Long)].collect()
    assert(e2.groupBy(_._2)(1L).map(_._1).toSet == (1L to 2500L).toSet)
    val t1e2 = e2.groupBy(_._2)(1L).sortBy(_._3).map(_._1).toSeq
    assert(t1e2 != t1)
  }
}
