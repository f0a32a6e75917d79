package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import java.sql.Date

class SeasonalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def day(i: Int): Date =
    Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i))

  test("perfect weekly pattern: seasonal MAE 0, naive-1 MAE is the step size") {
    // 28 days of a strict 7-day cycle 10,20,...,70 — two facts per day
    // to prove the daily aggregate happens first
    val rows = (0 until 28).flatMap { i =>
      val v = (i % 7 + 1) * 10.0
      Seq((day(i), v / 2), (day(i), v / 2))
    }.toDF("d", "amount")
    val Array(r) = Seasonal.seasonalNaiveError(rows, col("d"),
      col("amount"), season = 7)
      .as[(Long, Long, Long, Double, Double, Double, Boolean)].collect()
    val (nDays, np1, nps, mae1, maes, mase, wins) = r
    assert(nDays == 28 && np1 == 27 && nps == 21)
    assert(maes == 0.0 && wins && mase == 0.0)
    // |Δ| along the cycle: 10 six times then 60 at the wrap, per week
    val diffs = (1 until 28).map(i =>
      math.abs((i % 7 + 1) * 10.0 - ((i - 1) % 7 + 1) * 10.0))
    assert(math.abs(mae1 - diffs.sum / diffs.size) < 1e-9)
  }

  test("aseasonal random-walk-ish series: seasonal lag does NOT win") {
    val vals = Seq(1.0, 5.0, 2.0, 8.0, 3.0, 9.0, 4.0, 50.0, 6.0, 90.0,
      7.0, 95.0, 8.0, 99.0, 9.0, 60.0)
    val rows = vals.zipWithIndex.map { case (v, i) => (day(i), v) }
      .toDF("d", "amount")
    val Array(r) = Seasonal.seasonalNaiveError(rows, col("d"),
      col("amount"), season = 7)
      .as[(Long, Long, Long, Double, Double, Double, Boolean)].collect()
    assert(r._1 == 16 && r._2 == 15 && r._3 == 9)
    assert(r._6 > 1.0 && !r._7) // mase > 1: weekly lag loses
  }

  test("constant series: naive-1 MAE 0 and MASE is NULL (never NaN)") {
    // a flat series is PERFECTLY naive-1-predictable: mae_naive1 = 0
    // and the ratio is undefined — explicit NULL, not NaN/Infinity
    val rows = (0 until 14).map(i => (day(i), 5.0)).toDF("d", "amount")
    val Array(r) = Seasonal.seasonalNaiveError(rows, col("d"),
      col("amount"), season = 7)
      .as[(Long, Long, Long, Double, Double, Option[Double], Boolean)]
      .collect()
    assert(r._4 == 0.0 && r._5 == 0.0)
    assert(r._6.isEmpty) // mase NULL
    assert(!r._7)        // seasonal does not strictly win a tie
  }

  test("gaps in the calendar shrink the pair sets, never crash") {
    val rows = Seq((day(0), 1.0), (day(1), 2.0), (day(10), 3.0))
      .toDF("d", "amount")
    val Array(r) = Seasonal.seasonalNaiveError(rows, col("d"),
      col("amount"), season = 7)
      .as[(Long, Long, Long, Double, Option[Double], Option[Double],
        Option[Boolean])]
      .collect()
    assert(r._1 == 3 && r._2 == 1 && r._3 == 0) // only day0->day1 pairs
    assert(r._4 == 1.0 && r._5.isEmpty && r._6.isEmpty) // no seasonal pairs
  }
}
