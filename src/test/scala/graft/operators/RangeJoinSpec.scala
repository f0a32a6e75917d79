package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import graft.TestSpark

class RangeJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("matches each point to every containing interval, exactly once") {
    val intervals = Seq(
      ("w1", ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00")),
      ("w2", ts("2024-01-02 00:00:00"), ts("2024-01-05 00:00:00"))
    ).toDF("win", "start_ts", "end_ts")
    val points = Seq(
      (1L, ts("2024-01-01 12:00:00")), // w1 only
      (2L, ts("2024-01-02 12:00:00")), // w1 and w2 (overlap)
      (3L, ts("2024-01-03 00:00:00")), // w2 only (w1 end exclusive)
      (4L, ts("2024-01-06 00:00:00"))  // none
    ).toDF("pid", "pts")
    val out = RangeJoin.pointInInterval(points, intervals, "pts", "start_ts", "end_ts")
      .select("win", "pid").as[(String, Long)].collect().toList.sorted
    assert(out == List(("w1", 1L), ("w1", 2L), ("w2", 2L), ("w2", 3L)))
  }

  test("no duplicate matches across buckets for multi-bucket intervals") {
    val intervals = Seq(("wide", ts("2024-01-01 00:00:00"), ts("2024-01-31 00:00:00")))
      .toDF("win", "start_ts", "end_ts")
    val points = (1 to 20).map(i => (i.toLong, ts(f"2024-01-$i%02d 10:00:00")))
      .toDF("pid", "pts")
    val out = RangeJoin.pointInInterval(points, intervals, "pts", "start_ts", "end_ts")
    assert(out.count() == 20)
    assert(out.select("pid").distinct().count() == 20)
  }
}
