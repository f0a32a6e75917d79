package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class ExperimentSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def variantOf(id: Long, seed: Long): Long = {
    val h = (id % Sample.Prime) * (Sample.Mult + seed) %
      Sample.Prime2 * Sample.Mult2
    ((h % 2) + 2) % 2
  }

  test("hand-computed two-proportion z on a fixed split") {
    // users 0..99, conversion = id divisible by 3 (events duplicated to
    // prove the per-user rollup dedups)
    val events = (0L until 100L).flatMap(u =>
      Seq((u, u % 3 == 0), (u, false))).toDF("user_id", "conv")
    val Array(r) = Experiment.abConversionLift(
      events, "user_id", col("conv"), seed = 5L)
      .as[(Long, Long, Long, Long, Double, Double, Double,
        Option[Double], Boolean)].collect()
    val (na, xa, nb, xb, ra, rb, lift, z, sig) = r
    val byVar = (0L until 100L).groupBy(variantOf(_, 5L))
    assert(na == byVar(0L).size && nb == byVar(1L).size)
    assert(xa == byVar(0L).count(_ % 3 == 0))
    assert(xb == byVar(1L).count(_ % 3 == 0))
    val (pa, pb) = (xa.toDouble / na, xb.toDouble / nb)
    val pooled = (xa + xb).toDouble / (na + nb)
    val want = (pb - pa) /
      math.sqrt(pooled * (1 - pooled) * (1.0 / na + 1.0 / nb))
    assert(ra == math.rint(pa * 1e9) / 1e9)
    assert(rb == math.rint(pb * 1e9) / 1e9)
    assert(lift == math.rint((pb - pa) * 1e9) / 1e9)
    assert(math.abs(z.get - want) < 1e-8)
    assert(sig == (math.abs(z.get) > Experiment.CriticalZ))
  }

  test("degenerate pooled rate -> NULL z, false verdict, no ANSI error") {
    val all = (0L until 20L).map((_, true)).toDF("user_id", "conv")
    val Array(r) = Experiment.abConversionLift(all, "user_id", col("conv"))
      .select("z_stat", "significant").as[(Option[Double], Boolean)]
      .collect()
    assert(r._1.isEmpty && !r._2)
    val none = (0L until 20L).map((_, false)).toDF("user_id", "conv")
    val Array(r2) = Experiment.abConversionLift(none, "user_id", col("conv"))
      .select("z_stat", "significant").as[(Option[Double], Boolean)]
      .collect()
    assert(r2._1.isEmpty && !r2._2)
  }

  test("assignment is a pure function of (id, seed): seeds differ, reruns agree") {
    val events = (0L until 50L).map((_, false)).toDF("user_id", "conv")
    def counts(seed: Long) = Experiment.abConversionLift(
      events, "user_id", col("conv"), seed = seed)
      .select("n_a", "n_b").as[(Long, Long)].collect().head
    assert(counts(1L) == counts(1L)) // replayable
    val s1 = (0L until 50L).count(variantOf(_, 1L) == 0L)
    assert(counts(1L)._1 == s1) // matches the portable hash exactly
  }

  test("rocAuc: perfect, inverted, and hand midrank-tie cases") {
    // perfect separation: every positive scores above every negative
    val perfect = Seq((true, 10.0), (true, 9.0), (false, 2.0),
      (false, 1.0)).toDF("y", "s")
    val Array(p) = Experiment.rocAuc(perfect, col("y"), col("s"))
      .as[(Long, Long, Option[Double])].collect()
    assert(p == ((2L, 2L, Some(1.0))))
    // fully inverted ranking -> 0
    val inv = Seq((false, 10.0), (false, 9.0), (true, 2.0), (true, 1.0))
      .toDF("y", "s")
    val Array(i) = Experiment.rocAuc(inv, col("y"), col("s"))
      .as[(Long, Long, Option[Double])].collect()
    assert(i._3.contains(0.0))
    // midrank ties: pos at {3, 2}, neg at {2, 1}; pairs: (3>2)=1,
    // (3>1)=1, (2=2)=0.5, (2>1)=1 -> AUC = 3.5/4 = 0.875
    val tie = Seq((true, 3.0), (true, 2.0), (false, 2.0), (false, 1.0))
      .toDF("y", "s")
    val Array(t) = Experiment.rocAuc(tie, col("y"), col("s"))
      .as[(Long, Long, Option[Double])].collect()
    assert(t == ((2L, 2L, Some(0.875))))
  }

  test("rocAuc: single-class and empty inputs keep the one-row NULL shape") {
    val onlyPos = Seq((true, 1.0), (true, 2.0)).toDF("y", "s")
    val Array(r) = Experiment.rocAuc(onlyPos, col("y"), col("s"))
      .as[(Long, Long, Option[Double])].collect()
    assert(r == ((2L, 0L, None))) // undefined, never 0 or 1
    val empty = Seq.empty[(Boolean, Double)].toDF("y", "s")
    val out = Experiment.rocAuc(empty, col("y"), col("s")).collect()
    assert(out.length == 1 && out.head.isNullAt(2))
  }
}
