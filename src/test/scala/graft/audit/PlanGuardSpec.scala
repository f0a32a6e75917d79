package graft.audit

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class PlanGuardSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("assertNoCartesian flags a true cartesian product") {
    val a = spark.range(100).toDF("x")
    val b = spark.range(100).toDF("y")
    val cart = a.join(b.hint("shuffle_replicate_nl"))
    assertThrows[IllegalArgumentException](PlanGuard.assertNoCartesian(cart))
  }

  test("assertNoCartesian allows the one-row scalar cross join") {
    val a = spark.range(100).toDF("x")
    val total = a.agg(count(lit(1)).as("n"))
    PlanGuard.assertNoCartesian(a.crossJoin(total))
  }

  test("assertMaxExchanges enforces an operator's shuffle budget") {
    val df = Seq((1L, 2.0), (1L, 3.0), (2L, 4.0)).toDF("k", "v")
    val oneShuffle = df.groupBy("k").agg(sum("v"))
    PlanGuard.assertMaxExchanges(oneShuffle, 1)
    assertThrows[IllegalArgumentException](
      PlanGuard.assertMaxExchanges(oneShuffle.repartition(col("k") * 2), 1))
  }
}
