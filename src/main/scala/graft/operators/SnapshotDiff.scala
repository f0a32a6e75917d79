package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot differencing — derive a changefeed (inserts / updates /
  * deletes) from two versions of a keyed table. The CDC-extraction
  * primitive for stores that only publish full snapshots: downstream
  * incremental consumers (SCD2 apply, upsert sinks, audit trails) then
  * run off the diff instead of reprocessing the snapshot.
  *
  * Shape: ONE full-outer equi-join on the key — both snapshots shuffle
  * once on the same key (co-partitioned if the snapshots are written
  * bucketed by key, in which case zero exchanges), change classification
  * is a projection. Value comparison is null-safe (`<=>` per column),
  * so a column going NULL↔value is an update, not a false unchanged.
  * Unchanged rows are dropped before anything else sees them — the diff
  * is the (typically tiny) output, never snapshot-sized.
  */
object SnapshotDiff {

  /** Changefeed between `oldDf` and `newDf`. Output: key columns,
    * `change_type` ∈ {insert, update, delete}, and `old_`/`new_`
    * prefixed value columns (null on the absent side).
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
                   keys: Seq[String]): DataFrame = {
    val valueCols = oldDf.columns.filterNot(keys.contains).toSeq
    require(valueCols == newDf.columns.filterNot(keys.contains).toSeq,
      s"snapshots must share a schema; old has $valueCols, " +
        s"new has ${newDf.columns.toSeq}")
    val o = oldDf.select(keys.map(col) :+
      struct(valueCols.map(col): _*).as("__old"): _*)
    val n = newDf.select(keys.map(col) :+
      struct(valueCols.map(col): _*).as("__new"): _*)
    val sameValues = valueCols
      .map(c => col("__old").getField(c) <=> col("__new").getField(c))
      .reduce(_ && _)
    o.join(n, keys, "full_outer")
      .withColumn("change_type",
        when(col("__old").isNull, lit("insert"))
          .when(col("__new").isNull, lit("delete"))
          .when(sameValues, lit("unchanged"))
          .otherwise(lit("update")))
      .filter(col("change_type") =!= "unchanged")
      .select(keys.map(col) ++ Seq(col("change_type")) ++
        valueCols.map(c => col("__old").getField(c).as(s"old_$c")) ++
        valueCols.map(c => col("__new").getField(c).as(s"new_$c")): _*)
  }
}
