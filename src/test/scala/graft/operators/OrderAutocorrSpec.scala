package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class OrderAutocorrSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ordered(xs: Seq[Double]) =
    xs.zipWithIndex.map { case (x, i) => (i + 1L, x) }.toDF("pos", "x")

  /** Reference Pearson r of consecutive pairs, straight from the
    * definition (computed on the raw doubles).
    */
  private def refR(xs: Seq[Double]): Double = {
    val p = xs.init.zip(xs.tail)
    val n = p.size.toDouble
    val (sx, sy) = (p.map(_._1).sum, p.map(_._2).sum)
    val sxy = p.map { case (a, b) => a * b }.sum
    val sxx = p.map(a => a._1 * a._1).sum
    val syy = p.map(a => a._2 * a._2).sum
    (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
  }

  test("monotone order ~1, alternating order strongly negative") {
    val mono = (1 to 50).map(_.toDouble)
    val Array((n1, r1)) = Sample.orderAutocorrelation(ordered(mono),
      "pos", col("x")).as[(Long, Double)].collect()
    assert(n1 == 49 && math.abs(r1 - refR(mono)) < 1e-6 && r1 > 0.99)
    val alt = (1 to 50).map(i => if (i % 2 == 0) 10.0 else -10.0)
    val Array((_, r2)) = Sample.orderAutocorrelation(ordered(alt),
      "pos", col("x")).as[(Long, Double)].collect()
    assert(r2 < -0.99)
  }

  test("epochOrder's shuffle decorrelates a sorted input") {
    val docs = (1L to 400L).map(i => (i, i.toDouble)).toDF("id", "diff")
    val shuffled = Sample.epochOrder(docs, "id", epoch = 2L)
    val Array((_, rSh)) = Sample.orderAutocorrelation(shuffled,
      "train_pos", col("diff")).as[(Long, Double)].collect()
    val sorted = Ranks.rowNumber(docs, "diff", ascending = true,
      tiebreaks = Seq("id"), out = "pos")
    val Array((_, rSo)) = Sample.orderAutocorrelation(sorted,
      "pos", col("diff")).as[(Long, Double)].collect()
    assert(rSo > 0.99)           // the anti-pattern reads ~1
    assert(math.abs(rSh) < 0.2)  // the shuffle reads ~0
  }

  test("pairs come from the position join; degenerate variance -> NULL") {
    // positions 1,2,4 -> only (1,2) pairs; the 2->4 jump is no pair,
    // and a single pair has zero variance: r is undefined, not an error
    val df = Seq((1L, 5.0), (2L, 6.0), (4L, 100.0)).toDF("pos", "x")
    val Array((n, r)) = Sample.orderAutocorrelation(df, "pos", col("x"))
      .as[(Long, Option[Double])].collect()
    assert(n == 1 && r.isEmpty)
    // constant metric over many pairs: same NULL contract
    val const = (1L to 10L).map((_, 3.0)).toDF("pos", "x")
    val Array((nc, rc)) = Sample.orderAutocorrelation(const, "pos", col("x"))
      .as[(Long, Option[Double])].collect()
    assert(nc == 9 && rc.isEmpty)
  }
}
