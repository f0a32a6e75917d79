package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import graft.TestSpark

class SessionizeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // user 1: two sessions split by a 31-min gap; user 2: one session
  private def events = Seq(
    (1L, 10L, ts("2024-01-01 10:00:00"), 1.0),
    (1L, 11L, ts("2024-01-01 10:10:00"), 2.0),
    (1L, 12L, ts("2024-01-01 10:41:00"), 4.0), // 31 min after previous
    (2L, 20L, ts("2024-01-01 09:00:00"), 8.0)
  ).toDF("user_id", "event_id", "ts", "value")

  test("withSessionSeq splits on gaps strictly greater than the threshold") {
    val seqs = Sessionize.withSessionSeq(events, "user_id", "ts", 1800L,
      Seq(col("event_id").asc))
      .orderBy("user_id", "ts")
      .select("user_id", "session_seq").as[(Long, Long)].collect().toSeq
    assert(seqs == Seq((1L, 1L), (1L, 1L), (1L, 2L), (2L, 1L)))
  }

  test("a gap of exactly the threshold stays in the same session") {
    val df = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, 2L, ts("2024-01-01 10:30:00"), 1.0) // exactly 1800s later
    ).toDF("user_id", "event_id", "ts", "value")
    val seqs = Sessionize.withSessionSeq(df, "user_id", "ts", 1800L,
      Seq(col("event_id").asc))
      .select("session_seq").as[Long].collect().toSet
    assert(seqs == Set(1L))
  }

  test("sessionStats aggregates bounds, counts, and values per session") {
    val out = Sessionize.sessionStats(events, "user_id", "ts", "value", 1800L,
      Seq(col("event_id").asc))
      .orderBy("user_id", "session_seq").collect()
    assert(out.length == 3)
    val first = out(0)
    assert(first.getAs[Long]("n_events") == 2L)
    assert(first.getAs[Timestamp]("session_start") == ts("2024-01-01 10:00:00"))
    assert(first.getAs[Timestamp]("session_end") == ts("2024-01-01 10:10:00"))
    assert(first.getAs[Double]("total_value") == 3.0)
    assert(out(1).getAs[Long]("n_events") == 1L)
    assert(out(2).getAs[Double]("total_value") == 8.0)
  }

  test("session rollup adds no exchange beyond the user_id window shuffle") {
    graft.audit.PlanGuard.assertMaxExchanges(
      Sessionize.sessionStats(events, "user_id", "ts", "value", 1800L,
        Seq(col("event_id").asc)),
      max = 1)
  }

  test("transitionMatrix: hand-counted hops, exact ppm rows") {
    // user 1: a->b->a->b (hops ab, ba, ab); user 2: a->c; user
    // boundaries never produce a hop (user 2's c has no successor)
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, 2L, ts("2024-01-01 10:01:00"), "b"),
      (1L, 3L, ts("2024-01-01 10:02:00"), "a"),
      (1L, 4L, ts("2024-01-01 10:03:00"), "b"),
      (2L, 5L, ts("2024-01-01 09:00:00"), "a"),
      (2L, 6L, ts("2024-01-01 09:01:00"), "c")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val got = Sessionize.transitionMatrix(ev, "user_id", "ts",
        "event_type", Seq(col("event_id").asc))
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // src a: ab x2 + ac x1 -> 666666 / 333333 ppm (floor division)
    assert(got(("a", "b")) == ((2L, 666666L)))
    assert(got(("a", "c")) == ((1L, 333333L)))
    assert(got(("b", "a")) == ((1L, 1000000L)))
    assert(got.size == 3)
  }

  test("transitionMatrix: equal timestamps order by the tiebreak") {
    val ev = Seq(
      (1L, 2L, ts("2024-01-01 10:00:00"), "y"),
      (1L, 1L, ts("2024-01-01 10:00:00"), "x")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val got = Sessionize.transitionMatrix(ev, "user_id", "ts",
        "event_type", Seq(col("event_id").asc))
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got == Seq(("x", "y", 1L, 1000000L)))
  }

  test("stationaryDistribution: two-state alternating chain stays uniform") {
    // a -> b -> a strictly: P is the swap matrix, uniform is stationary
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, ts("2024-01-01 10:01:00"), "b"),
      (1L, ts("2024-01-01 10:02:00"), "a"),
      (1L, ts("2024-01-01 10:03:00"), "b"),
      (1L, ts("2024-01-01 10:04:00"), "a")
    ).toDF("user_id", "ts", "event_type")
    val got = Sessionize.stationaryDistribution(ev, "user_id", "ts",
        "event_type", Seq(col("ts").asc), iters = 6)
      .as[(String, Double)].collect().toMap
    assert(got("a") == 0.5 && got("b") == 0.5)
  }

  test("stationaryDistribution: dst-only state gets a self-loop and absorbs") {
    // a -> z only; z never re-emits: z is absorbing, all mass ends in z
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, ts("2024-01-01 10:01:00"), "z")
    ).toDF("user_id", "ts", "event_type")
    val got = Sessionize.stationaryDistribution(ev, "user_id", "ts",
        "event_type", Seq(col("ts").asc), iters = 8)
      .as[(String, Double)].collect().toMap
    // pi0 = (.5, .5); after one step all of a's mass moved to z and
    // z's self-loop keeps it: (0, 1)
    assert(got("a") == 0.0 && got("z") == 1.0)
  }
}
