package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Ranks (bucketed two-pass global ranks) vs the single-partition
  * window it replaces: brute-force equality on real sf0.001 tables
  * (ties included), both directions, plus the plan pin that the fact
  * rows are hash-distributed by bucket (not funneled to one task).
  */
class RanksSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def orders = graft.Tables.t(spark, sf, "orders")
    .select(col("o_orderkey"), col("o_totalprice"))
  private def lineitem = graft.Tables.t(spark, sf, "lineitem")
    .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))

  test("rowNumber asc == global window row_number") {
    val got = Ranks.rowNumber(orders, "o_totalprice", ascending = true,
        tiebreaks = Seq("o_orderkey"), out = "rn", buckets = 8)
      .select("o_orderkey", "rn").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exp = orders.withColumn("rn",
        row_number().over(Window.orderBy(col("o_totalprice").asc,
          col("o_orderkey").asc)).cast("long"))
      .select("o_orderkey", "rn").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exp)
  }

  test("rowNumber desc == global window row_number desc") {
    val got = Ranks.rowNumber(orders, "o_totalprice", ascending = false,
        tiebreaks = Seq("o_orderkey"), out = "rn", buckets = 8)
      .select("o_orderkey", "rn").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exp = orders.withColumn("rn",
        row_number().over(Window.orderBy(col("o_totalprice").desc,
          col("o_orderkey").asc)).cast("long"))
      .select("o_orderkey", "rn").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exp)
  }

  test("minRank == global window rank() on a heavily-tied column") {
    // l_quantity: ~50 distinct values over thousands of rows — every
    // bucket boundary lands between tie groups by construction.
    val got = Ranks.minRank(lineitem, "l_quantity", ascending = true,
        out = "r", buckets = 8)
      .collect().map(r => (r.get(0).toString, r.getLong(1))).toSet
    val exp = lineitem.withColumn("r",
        rank().over(Window.orderBy(col("l_quantity").asc)).cast("long"))
      .select("l_quantity", "r").distinct()
      .collect().map(r => (r.get(0).toString, r.getLong(1))).toSet
    assert(got == exp)
  }

  test("fact rows hash-distribute by bucket (no fact-scale single partition)") {
    val plan = Ranks.rowNumber(orders, "o_totalprice", ascending = true,
        tiebreaks = Seq("o_orderkey"), out = "rn")
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(__b"),
      s"expected the window input partitioned by __b:\n${plan.take(3000)}")
  }
}
