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
      .as[(String, java.math.BigDecimal, Long, Long)].collect()
      .map(r => (r._1, r._2.toPlainString, r._3, r._4)).toSet
    val scratch = IncrementalAgg.sumCountAgg(nw, "o_orderpriority",
        "o_totalprice")
      .as[(String, java.math.BigDecimal, Long, Long)].collect()
      .map(r => (r._1, r._2.toPlainString, r._3, r._4)).toSet
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
      .as[(String, java.math.BigDecimal, Long, Long)].collect()
      .map(r => (r._1, r._2.doubleValue, r._3, r._4)).toSet
    assert(got == Set(("a", 18.0, 2L, 2L), ("c", 2.0, 1L, 1L)))
  }

  test("all-NULL-value group reads sum_value NULL, matching from-scratch") {
    val old = Seq((1L, "a", Some(10.0)), (2L, "a", None),
      (3L, "b", Some(7.0)), (4L, "b", None)).toDF("k", "g", "v")
    // delete row 1: group a's surviving values are all NULL; update
    // row 3's value to NULL: group b goes all-NULL too but keeps both
    // rows; insert row 5 with a NULL value into a fresh group c
    val nw = Seq((2L, "a", Option.empty[Double]), (3L, "b", None),
      (4L, "b", None), (5L, "c", None)).toDF("k", "g", "v")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, Option[java.math.BigDecimal], Long, Long)].collect()
        .map(r => (r._1, r._2.map(_.toPlainString), r._3, r._4)).toSet
    val inc = canon(IncrementalAgg.applyAggDelta(
      IncrementalAgg.sumCountAgg(old, "g", "v"),
      SnapshotDiff.snapshotDiff(old, nw, Seq("k")), "g", "v"))
    val scratch = canon(IncrementalAgg.sumCountAgg(nw, "g", "v"))
    assert(inc == scratch)
    assert(inc.forall { case (_, sum, nVals, _) =>
      (nVals == 0L) == sum.isEmpty })
    assert(inc.map(_._1) == Set("a", "b", "c"))
  }
}
