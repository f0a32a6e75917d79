package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class AsOfJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def left = Seq(
    (1L, 10L, "a"), (1L, 25L, "b"), (2L, 5L, "c")
  ).toDF("k", "ts", "v")
  private def right = Seq(
    (1L, 10L, "P10"), (1L, 20L, "P20"), (2L, 50L, "P50")
  ).toDF("k", "sts", "p")

  test("attaches the latest right row at-or-before each left timestamp") {
    val out = AsOfJoin.asOf(left, right, Seq("k"), "ts", "sts")
      .orderBy("k", "ts")
      .select("k", "ts", "v", "sts", "p")
      .as[(Long, Long, String, Option[Long], Option[String])].collect()
    assert(out(0) == ((1L, 10L, "a", Some(10L), Some("P10")))) // inclusive <=
    assert(out(1) == ((1L, 25L, "b", Some(20L), Some("P20")))) // latest before
    assert(out(2) == ((2L, 5L, "c", None, None)))              // nothing before
  }

  test("left row count is preserved (left-join semantics)") {
    assert(AsOfJoin.asOf(left, right, Seq("k"), "ts", "sts").count() == left.count())
  }

  test("payload name collisions are rejected") {
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left, left.withColumnRenamed("ts", "sts"), Seq("k"), "ts", "sts")
    }
  }
}
