package graft.operators

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SurvivalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(day: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-${day}%02d 12:00:00")

  test("kaplanMeier: hand product-limit with censoring") {
    // edge = Jan 20 (user 4's last day), horizon 5 days:
    //   u1: Jan 1..3  -> dur 2, last 17d before edge -> death
    //   u2: Jan 1..5  -> dur 4, 15d before edge      -> death
    //   u3: Jan 1..18 -> dur 17, 2d before edge      -> CENSORED
    //   u4: Jan 1..20 -> dur 19, at the edge         -> CENSORED
    val ev = Seq((1L, ts(1)), (1L, ts(3)), (2L, ts(1)), (2L, ts(5)),
      (3L, ts(1)), (3L, ts(18)), (4L, ts(1)), (4L, ts(20)))
      .toDF("user_id", "ts")
    val got = Survival.kaplanMeier(ev, "user_id", "ts", horizonDays = 5)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // t=2: n=4, d=1 -> S = 3/4; t=4: n=3, d=1 -> S = 3/4 * 2/3 = 1/2;
    // t=17, t=19: pure censoring, survival unchanged
    assert(got(2L) == ((4L, 1L, 0L, 0.75)))
    assert(got(4L) == ((3L, 1L, 0L, 0.5)))
    assert(got(17L) == ((2L, 0L, 1L, 0.5)))
    assert(got(19L) == ((1L, 0L, 1L, 0.5)))
    assert(got.size == 4)
  }

  test("kaplanMeier: everyone-dies step pins survival to exact 0") {
    // both users churned (edge = u3's Jan 15, horizon 2): at the last
    // death step d = n -> factor 0; log-space would be ln(0), the
    // guard must emit exact 0.0 instead
    val ev = Seq((1L, ts(1)), (1L, ts(2)), (2L, ts(1)), (2L, ts(3)),
      (3L, ts(1)), (3L, ts(15)))
      .toDF("user_id", "ts")
    val got = Survival.kaplanMeier(ev, "user_id", "ts", horizonDays = 2)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._5))).toMap
    // durations: u1 -> 1 (death), u2 -> 2 (death), u3 -> 14 (censored);
    // survival carries the operator's 9-dp rounding contract
    assert(got(1L) == ((3L, 1L, 0.666666667)))
    assert(got(2L) == ((2L, 1L, 0.333333333)))
    assert(got(14L)._3 == 0.333333333)
    // a step where EVERYONE at risk dies: u1 (Jan 1..5, dur 4) churns
    // — the edge is set by u2's single Jan-10 event (dur 0, censored,
    // as the edge-setter always is) — so at dur 4 the risk set is
    // exactly the one death: d = n -> exact 0, never ln(0)
    val ev2 = Seq((1L, ts(1)), (1L, ts(5)), (2L, ts(10)))
      .toDF("user_id", "ts")
    val last = Survival.kaplanMeier(ev2, "user_id", "ts", horizonDays = 2)
      .filter(col("duration_days") === 4)
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(last._2 == 1L && last._3 == 1L && last._5 == 0.0)
  }

  test("kaplanMeier: single-event users have duration 0; empty input empty out") {
    val ev = Seq((1L, ts(1)), (2L, ts(10))).toDF("user_id", "ts")
    // edge = Jan 10; horizon 3: u1 churned at dur 0, u2 censored at 0
    val got = Survival.kaplanMeier(ev, "user_id", "ts", horizonDays = 3)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(got.toSeq == Seq((0L, 2L, 1L, 1L, 0.5)))
    val empty = Seq.empty[(Long, Timestamp)].toDF("user_id", "ts")
    assert(Survival.kaplanMeier(empty, "user_id", "ts", 3).collect().isEmpty)
  }
}
