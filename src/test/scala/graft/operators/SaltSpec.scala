package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SaltSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("saltedAgg equals the unsalted aggregation on a skewed key") {
    // hot key: 10k rows for user 1, a handful for others
    val df = ((1 to 10000).map(i => (1L, i.toDouble)) ++
      Seq((2L, 5.0), (2L, 7.0), (3L, 1.0))).toDF("user_id", "v")
    val salted = Salt.saltedAgg(df, Seq("user_id"), saltBuckets = 8, Map(
      "total" -> (col("v"), "sum"),
      "cnt" -> (col("v"), "count"),
      "vmin" -> (col("v"), "min"),
      "vmax" -> (col("v"), "max")))
    val plain = df.groupBy("user_id").agg(
      sum($"v").as("total"), count($"v").as("cnt"),
      min($"v").as("vmin"), max($"v").as("vmax"))
    val s = salted.orderBy("user_id").collect().map(_.toSeq)
    val p = plain.orderBy("user_id").collect().map(_.toSeq)
    assert(s.toSeq == p.toSeq)
  }

  test("approx_count_distinct lands within 2% of exact on testdata") {
    val ev = graft.Tables.t(spark, "/root/testdata/sf0.01", "events")
    val r = ev.agg(
      approx_count_distinct("user_id").as("approx"),
      countDistinct(col("user_id")).as("exact")).collect().head
    val (approx, exact) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.02, s"approx=$approx exact=$exact")
  }
}
