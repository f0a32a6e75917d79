package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import java.sql.Timestamp

class DecaySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(day: String) = Timestamp.valueOf(s"$day 12:00:00")

  test("whole-half-life quantized weights: closed-form hand computation") {
    // as-of anchors at the max date (2024-01-29). Ages: 0d -> k=0 w=1;
    // 7d -> k=1 w=1/2; 20d -> k=2 w=1/4; 29d -> k=4... 29/7=4 -> 1/16
    val df = Seq(
      (1L, ts("2024-01-29"), 8.0),  // w=1
      (1L, ts("2024-01-22"), 8.0),  // w=1/2
      (1L, ts("2024-01-09"), 8.0),  // 20d, k=2, w=1/4
      (2L, ts("2023-12-31"), 16.0)  // 29d, k=4, w=1/16
    ).toDF("user_id", "ts", "value")
    val m = Decay.halfLifeAgg(df, "user_id", "ts", "value", 7)
      .as[(Long, Double, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(m(1L) == ((8.0 + 4.0 + 2.0, 3L)))
    assert(m(2L) == ((1.0, 1L)))
  }

  test("future-dated events clamp to weight 1, never amplify") {
    // an event AFTER the anchor (possible with clock skew upstream)
    // must not get a negative k
    val df = Seq(
      (1L, ts("2024-01-01"), 4.0),
      (1L, ts("2024-01-01"), 4.0)).toDF("user_id", "ts", "value")
    val got = Decay.halfLifeAgg(df, "user_id", "ts", "value", 7)
      .as[(Long, Double, Long)].collect().head
    assert(got._2 == 8.0 && got._3 == 2L)
  }

  test("ancient events decay to ~0 without shift overflow") {
    val df = Seq(
      (1L, ts("2024-01-01"), 100.0),
      (1L, ts("1970-01-01"), 1e12)).toDF("user_id", "ts", "value")
    val got = Decay.halfLifeAgg(df, "user_id", "ts", "value", 7)
      .as[(Long, Double, Long)].collect().head
    // 1e12 * 2^-62 ~ 2e-7, rounds into the decimal's 15 places; the
    // point is no overflow/NaN and the fresh event dominates
    assert(got._2 >= 100.0 && got._2 < 100.001)
  }

  test("layout-independent: decimal accumulation erases partition order") {
    val rows = (1 to 500).map(i =>
      (i % 7L, ts(f"2024-01-${i % 28 + 1}%02d"), i * 0.37))
    val df = rows.toDF("user_id", "ts", "value")
    val a = Decay.halfLifeAgg(df.repartition(1), "user_id", "ts", "value", 7)
      .collect().map(_.toString).sorted.toSeq
    val b = Decay.halfLifeAgg(df.repartition(17), "user_id", "ts", "value", 7)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }
}
