package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SessionPairsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("pairs accumulate context within a session and reset across the gap") {
    // user 1: view, cart, buy within minutes; then a 2-hour gap and a
    // fresh session view, help
    val ev = Seq(
      (1L, 10L, ts(0), "view"), (1L, 11L, ts(1), "cart"),
      (1L, 12L, ts(2), "buy"),
      (1L, 13L, java.sql.Timestamp.valueOf("2024-01-01 13:00:00"), "view"),
      (1L, 14L, java.sql.Timestamp.valueOf("2024-01-01 13:05:00"), "help")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val out = Sessionize.sessionPairs(ev, "user_id", "ts", "event_type",
        1800L, Seq(col("event_id").asc))
      .orderBy("session_seq", "pair_pos")
      .select("session_seq", "pair_pos", "context", "target")
      .as[(Long, Int, String, String)].collect().toSeq
    assert(out == Seq(
      (1L, 1, "view", "cart"),
      (1L, 2, "view cart", "buy"),
      (2L, 1, "view", "help")))
  }

  test("a single-event session emits no pair; ties order by the tiebreak") {
    val t0 = ts(0)
    val ev = Seq(
      (1L, 21L, t0, "a"), (1L, 20L, t0, "b"), // same ts: event_id orders b, a? no: 20 < 21 -> b first
      (2L, 30L, t0, "solo")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val out = Sessionize.sessionPairs(ev, "user_id", "ts", "event_type",
        1800L, Seq(col("event_id").asc))
      .select("user_id", "context", "target")
      .as[(Long, String, String)].collect().toSeq
    assert(out == Seq((1L, "b", "a")), "lower event_id is the context")
  }
}
