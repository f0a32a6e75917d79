package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.TestSpark
import java.sql.Timestamp

class DedupSinkSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("dedupSink drops within-batch AND cross-batch replays") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_dsink_").toString
    val input = MemoryStream[(Timestamp, Long, String)]
    val sq = Streams.dedupSink(
      input.toDF().toDF("ts", "event_id", "payload"),
      "ts", Seq("event_id"), delay = "10 days",
      s"$tmp/out", s"$tmp/ckpt")
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), 1L, "a"),
        (ts("2024-01-01 10:00:00"), 1L, "a"), // within-batch replay
        (ts("2024-01-01 11:00:00"), 2L, "b"))
      sq.processAllAvailable()
      input.addData(
        (ts("2024-01-01 10:00:00"), 1L, "a"), // cross-batch replay
        (ts("2024-01-01 12:00:00"), 3L, "c"))
      sq.processAllAvailable()
    } finally sq.stop()
    val out = spark.read.parquet(s"$tmp/out")
      .select("event_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 2L, 3L))
  }

  test("state is BOUNDED: a replay arriving past the horizon re-emits") {
    // the documented trade that makes the state size viable: delay
    // bounds how long a key is remembered, so a later replay is a new
    // row — callers size delay to the transport's replay horizon
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_dsink2_").toString
    val input = MemoryStream[(Timestamp, Long, String)]
    val sq = Streams.dedupSink(
      input.toDF().toDF("ts", "event_id", "payload"),
      "ts", Seq("event_id"), delay = "1 hour",
      s"$tmp/out", s"$tmp/ckpt")
    try {
      input.addData((ts("2024-01-01 10:00:00"), 1L, "a"))
      sq.processAllAvailable()
      // watermark jumps to 19:00; key 1's state (kept until 11:00)
      // expires
      input.addData((ts("2024-01-01 20:00:00"), 2L, "b"))
      sq.processAllAvailable()
      input.addData((ts("2024-01-01 20:30:00"), 1L, "a"))
      sq.processAllAvailable()
    } finally sq.stop()
    val out = spark.read.parquet(s"$tmp/out")
      .select("event_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 1L, 2L)) // the late replay re-emitted
  }
}
