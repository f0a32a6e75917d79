package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class IncrementalAggSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("applyAggDelta == from-scratch aggregate, bit-exactly, on real data") {
    val orders = graft.Tables.t(spark, "/root/testdata/sf0.001", "orders")
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
    val old = orders.filter(col("o_orderkey") % 10 =!= 0)
    val nw = orders.filter(col("o_orderkey") % 7 =!= 0)
      .withColumn("o_orderpriority",
        when(col("o_orderkey") % 13 === 0, lit("1-URGENT"))
          .otherwise(col("o_orderpriority")))
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 3 === 0, col("o_totalprice") + 10)
          .otherwise(col("o_totalprice")))
    val feed = SnapshotDiff.snapshotDiff(old, nw, Seq("o_orderkey"))
    // the fixture must exercise all three change types
    val kinds = feed.select("change_type").distinct()
      .as[String].collect().toSet
    assert(kinds == Set("insert", "update", "delete"))
    val inc = IncrementalAgg.applyAggDelta(
        IncrementalAgg.sumCountAgg(old, "o_orderpriority", "o_totalprice"),
        feed, "o_orderpriority", "o_totalprice")
      .as[(String, java.math.BigDecimal, Long)].collect()
      .map(r => (r._1, r._2.toPlainString, r._3)).toSet
    val scratch = IncrementalAgg.sumCountAgg(nw, "o_orderpriority",
        "o_totalprice")
      .as[(String, java.math.BigDecimal, Long)].collect()
      .map(r => (r._1, r._2.toPlainString, r._3)).toSet
    assert(inc == scratch)
  }

  test("group-moving update and emptied group on a hand fixture") {
    val old = Seq((1L, "a", 10.0), (2L, "a", 5.0), (3L, "b", 7.0))
      .toDF("k", "g", "v")
    // row 3 moves b→a (b empties), row 1 value changes, row 4 inserts,
    // row 2 deletes
    val nw = Seq((1L, "a", 11.0), (3L, "a", 7.0), (4L, "c", 2.0))
      .toDF("k", "g", "v")
    val got = IncrementalAgg.applyAggDelta(
        IncrementalAgg.sumCountAgg(old, "g", "v"),
        SnapshotDiff.snapshotDiff(old, nw, Seq("k")), "g", "v")
      .as[(String, java.math.BigDecimal, Long)].collect()
      .map(r => (r._1, r._2.doubleValue, r._3)).toSet
    assert(got == Set(("a", 18.0, 2L), ("c", 2.0, 1L)))
  }
}
