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
}
