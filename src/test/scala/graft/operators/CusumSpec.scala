package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import java.sql.Date

class CusumSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def day(i: Int): Date =
    Date.valueOf(java.time.LocalDate.of(2024, 3, 1).plusDays(i))

  test("step change: cusum ramps from the step and alarms at the bound") {
    // 10 days on-target, then 10 days +100/day; explicit plan target
    val rows = (0 until 20).map(i =>
      (day(i), if (i < 10) 100.0 else 200.0)).toDF("d", "v")
    val out = Seasonal.cusumDrift(rows, col("d"), col("v"),
      threshold = 350.0, target = 100.0)
      .as[(Date, Double, Double, Boolean)].collect()
      .sortBy(_._1.toString)
    assert(out.take(10).forall(r => r._3 == 0.0 && !r._4))
    // S grows 100/day from day 10: 100, 200, ..., 1000
    (10 until 20).foreach(i => assert(out(i)._3 == (i - 9) * 100.0))
    assert(out.indexWhere(_._4) == 13) // first S > 350 is day 13 (S=400)
  }

  test("one-sided: a downward drift never accumulates or alarms") {
    val rows = (0 until 12).map(i => (day(i), 100.0 - i * 5.0))
      .toDF("d", "v")
    val out = Seasonal.cusumDrift(rows, col("d"), col("v"),
      threshold = 1.0, target = 100.0)
      .as[(Date, Double, Double, Boolean)].collect()
    assert(out.forall(r => r._3 == 0.0 && !r._4))
  }

  test("default target is the series mean; facts aggregate per day first") {
    // two facts per day summing to 10, 30 -> daily series (10, 30),
    // mean 20: devs (-10, +10), P = (-10, 0), m = (-10, -10),
    // S = (0, 10)
    val rows = Seq((day(0), 4.0), (day(0), 6.0),
      (day(1), 12.0), (day(1), 18.0)).toDF("d", "v")
    val out = Seasonal.cusumDrift(rows, col("d"), col("v"),
      threshold = 5.0)
      .as[(Date, Double, Double, Boolean)].collect()
      .sortBy(_._1.toString)
    assert(out.map(_._2).toSeq == Seq(10.0, 30.0))
    assert(out.map(_._3).toSeq == Seq(0.0, 10.0))
    assert(out.map(_._4).toSeq == Seq(false, true))
  }
}
