package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class OlsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("exact line recovers slope, intercept, r2 = 1") {
    val rows = (1 to 20).map(i => ("g", i.toDouble, 2.0 * i + 3.0))
      .toDF("g", "x", "y")
    val Array((_, n, slope, icpt, r2)) = Ols.fitGrouped(rows, "g",
      col("g"), col("x"), col("y"))
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect()
    assert(n == 20)
    assert(math.abs(slope.get - 2.0) < 1e-6)
    assert(math.abs(icpt.get - 3.0) < 1e-6)
    assert(math.abs(r2.get - 1.0) < 1e-6)
  }

  test("independent per-group fits in one aggregate") {
    val rows = ((1 to 10).map(i => ("up", i.toDouble, 5.0 * i)) ++
      (1 to 10).map(i => ("down", i.toDouble, 100.0 - i)))
      .toDF("g", "x", "y")
    val m = Ols.fitGrouped(rows, "g", col("g"), col("x"), col("y"))
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(math.abs(m("up")._3.get - 5.0) < 1e-6)
    assert(math.abs(m("down")._3.get + 1.0) < 1e-6)
    assert(math.abs(m("down")._4.get - 100.0) < 1e-5)
  }

  test("degenerate variance: constant x -> NULLs; flat y -> slope 0, r2 NULL") {
    val constX = (1 to 5).map(i => ("g", 7.0, i.toDouble)).toDF("g", "x", "y")
    val Array(r1) = Ols.fitGrouped(constX, "g", col("g"), col("x"), col("y"))
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect()
    assert(r1._3.isEmpty && r1._4.isEmpty && r1._5.isEmpty)
    val flatY = (1 to 5).map(i => ("g", i.toDouble, 9.0)).toDF("g", "x", "y")
    val Array(r2) = Ols.fitGrouped(flatY, "g", col("g"), col("x"), col("y"))
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect()
    assert(r2._3.contains(0.0) && r2._4.contains(9.0) && r2._5.isEmpty)
  }

  test("null x or y rows are excluded pairwise") {
    val rows = Seq(("g", Some(1.0), Some(5.0)), ("g", Some(2.0), Some(7.0)),
      ("g", None, Some(99.0)), ("g", Some(3.0), None),
      ("g", Some(3.0), Some(9.0))).toDF("g", "x", "y")
    val Array(r) = Ols.fitGrouped(rows, "g", col("g"), col("x"), col("y"))
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect()
    assert(r._2 == 3 && math.abs(r._3.get - 2.0) < 1e-6)
  }
}
