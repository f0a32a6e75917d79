package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (most-recent-at-or-before) join: for every left row, attach
  * the latest right row whose timestamp is <= the left timestamp, per
  * key — the standard way to join events to slowly-changing snapshots
  * (prices, user profiles, model versions) in a training-data pipeline.
  *
  * Spark-first composition (brief preference (a) — no custom physical
  * operator needed): tag and union both sides, then ONE window per key
  * ordered by (timestamp, side) carries the last non-null right payload
  * forward; left rows read the carried value. Exactly one shuffle on
  * the key and a per-partition sort — no range cross-product, no
  * per-row binary search, scales like any window aggregate. Ties:
  * right rows sort before left rows at equal timestamps (inclusive
  * <=), and equal-timestamp right rows resolve by a content-hash
  * tiebreak for determinism.
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String): DataFrame = {
    val lCols = left.columns.filterNot(keys.contains).toIndexedSeq
    val rCols = right.columns.filterNot(keys.contains).toIndexedSeq
    require(lCols.intersect(rCols).isEmpty,
      s"as-of join payload columns must not collide: ${lCols.intersect(rCols)}")
    val lType = StructType(left.schema.fields.filter(f => lCols.contains(f.name)))
    val rType = StructType(right.schema.fields.filter(f => rCols.contains(f.name)))

    val l2 = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__ts"), lit(1).as("__side"),
        struct(lCols.map(col): _*).as("__l"),
        lit(null).cast(rType).as("__r")): _*)
    val r2 = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"), lit(0).as("__side"),
        lit(null).cast(lType).as("__l"),
        struct(rCols.map(col): _*).as("__r")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), xxhash64(col("__r")))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l2.unionByName(r2)
      .withColumn("__carried", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        keys.map(col) ++
          lCols.map(c => col(s"__l.`$c`").as(c)) ++
          rCols.map(c => col(s"__carried.`$c`").as(c)): _*)
  }
}
