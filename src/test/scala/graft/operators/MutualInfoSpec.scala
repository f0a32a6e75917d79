package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class MutualInfoSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("independent balanced columns: MI exactly 0, entropies exact") {
    // product distribution: every (x, y) cell has the same count
    val rows = for { x <- 0 until 4; y <- 0 until 2; _ <- 0 until 5 }
      yield (x, y)
    val Array(r) = Quality.mutualInformation(rows.toDF("x", "y"),
      col("x"), col("y"))
      .as[(Double, Double, Double, Double, Long, Long)].collect()
    val (mi, hx, hy, nmi, nCells, n) = r
    assert(mi == 0.0 && nmi == 0.0)
    assert(nCells == 8 && n == 40)
    assert(math.abs(hx - math.log(4.0)) < 1e-5) // dsum DECIMAL(18,6) grain
    assert(math.abs(hy - math.log(2.0)) < 1e-5)
  }

  test("y determined by x: MI == H(y) == min entropy, NMI == 1") {
    val rows = for { x <- 0 until 4; _ <- 0 until 3 } yield (x, x % 2)
    val Array(r) = Quality.mutualInformation(rows.toDF("x", "y"),
      col("x"), col("y"))
      .as[(Double, Double, Double, Double, Long, Long)].collect()
    val (mi, hx, hy, nmi, _, _) = r
    assert(math.abs(mi - math.log(2.0)) < 1e-5)
    assert(math.abs(hy - math.log(2.0)) < 1e-5)
    assert(math.abs(hx - math.log(4.0)) < 1e-5) // dsum DECIMAL(18,6) grain
    assert(math.abs(nmi - 1.0) < 1e-5)
  }

  test("constant column: entropy 0, NMI is NULL (never NaN)") {
    // a constant y has H(y) = 0 — NMI = MI / min(H) is UNDEFINED, and
    // the contract is explicit NULL (the cohenKappa/krippendorffAlpha
    // degenerate-case discipline), not a NaN leaking out of 0/0
    val rows = Seq((1, "k"), (2, "k"), (3, "k"), (1, "k")).toDF("x", "y")
    val Array(r) = Quality.mutualInformation(rows, col("x"), col("y"))
      .as[(Double, Double, Double, Option[Double], Long, Long)].collect()
    assert(r._3 == 0.0)    // h_y exactly 0
    assert(r._4.isEmpty)   // nmi NULL, not NaN
    assert(!r._1.isNaN && r._1 == 0.0) // MI of a constant side is 0
  }

  test("null pairs are excluded, skew shows partial dependence") {
    val rows = Seq((Some(1), Some("a")), (Some(1), Some("a")),
      (Some(2), Some("b")), (Some(2), Some("a")),
      (None, Some("a")), (Some(3), None))
      .toDF("x", "y")
    val Array(r) = Quality.mutualInformation(rows, col("x"), col("y"))
      .as[(Double, Double, Double, Double, Long, Long)].collect()
    assert(r._6 == 4) // the two null-carrying rows never count
    assert(r._1 > 0.0 && r._4 > 0.0 && r._4 < 1.0)
  }
}
