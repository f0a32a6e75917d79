package graft.sim

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class BitextSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // 4-dim toy space: src0 is the exact translation of tgt10 (same
  // direction); src1 aligns with tgt11; tgt12 is a HUB (equidistant
  // from everything) that absolute cosine would pick for both sources.
  private def src = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f, 0.1f)),
    (1L, Seq(0.0f, 1.0f, 0.0f, 0.1f))
  ).toDF("vec_id", "embedding")

  private def tgt = Seq(
    (10L, Seq(0.9f, 0.05f, 0.0f, 0.1f)),
    (11L, Seq(0.05f, 0.9f, 0.0f, 0.1f)),
    (12L, Seq(0.5f, 0.5f, 0.5f, 0.5f))
  ).toDF("vec_id", "embedding")

  test("mine: margin picks the true translation over the hub") {
    val got = Bitext.mine(src, tgt, "vec_id", "embedding", k = 2)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(got == Map(0L -> 10L, 1L -> 11L))
  }

  test("mine: one row per source, margin near 1 for undistinguished pairs") {
    val out = Bitext.mine(src, tgt, "vec_id", "embedding", k = 3).collect()
    assert(out.length == 2)
    // with k = full target side, the best pair's margin must exceed 1
    // (its cosine beats its own neighborhood mean)
    out.foreach(r => assert(r.getDouble(2) > 1.0))
  }

  test("mine: margin is the exact rounded ratio on a hand pair") {
    // single src, two tgts -> c(s,t) known; ms = mean of both (k=2),
    // mt = the pair's own cosine (each tgt sees one src)
    val s1 = Seq((0L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val t2 = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val got = Bitext.mine(s1, t2, "vec_id", "embedding", k = 2)
      .as[(Long, Long, Double)].collect().head
    // cosines: (0,1)=1.0, (0,2)=0.0; ms = (1.0+0.0)/2 = 0.5
    // pair (0,1): mt = 1.0 -> margin = 1.0 / ((0.5+1.0)/2) = 4/3
    assert(got._1 == 0L && got._2 == 1L)
    assert(math.abs(got._3 - BigDecimal(4.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
  }

  test("mineLsh: candidates are confined but the planted pair survives") {
    // 64-dim: src vectors are near-copies of their targets, so SRP
    // collides them in at least one of the 8 tables with near
    // certainty; assert the LSH path recovers the brute top-1 for
    // every source it reports, and reports every source here.
    val dim = 64
    def vec(seedBase: Int) = Seq.tabulate(dim)(j =>
      (math.sin(seedBase * 31 + j) * 10).toFloat)
    val srcBig = Seq.tabulate(6)(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val tgtBig = Seq.tabulate(6)(i =>
      (100L + i, vec(i).updated(0, vec(i)(0) + 0.01f))).toDF("vec_id", "embedding")
    val brute = Bitext.mine(srcBig, tgtBig, "vec_id", "embedding", k = 3)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    val lsh = Bitext.mineLsh(srcBig, tgtBig, "vec_id", "embedding",
      k = 3, bits = 8, dim = dim, tables = 8)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(brute == Seq.tabulate(6)(i => i.toLong -> (100L + i)).toMap)
    assert(lsh.keySet == brute.keySet)
    lsh.foreach { case (s, t) => assert(brute(s) == t) }
  }

  test("mineLsh plan pin: candidates come from an equi-join, never a cross product") {
    val dim = 64
    def vec(seedBase: Int) = Seq.tabulate(dim)(j =>
      (math.sin(seedBase * 31 + j) * 10).toFloat)
    val srcBig = Seq.tabulate(4)(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val tgtBig = Seq.tabulate(4)(i => (100L + i, vec(i))).toDF("vec_id", "embedding")
    val plan = Bitext.mineLsh(srcBig, tgtBig, "vec_id", "embedding",
        k = 2, bits = 8, dim = dim, tables = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"the LSH path must never cross-product:\n${plan.take(2000)}")
  }
}
