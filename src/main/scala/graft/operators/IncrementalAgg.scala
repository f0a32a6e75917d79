package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental maintenance of a per-group SUM/COUNT aggregate table
  * from a [[SnapshotDiff]] changefeed — materialized-view maintenance
  * without rescanning the base table. At 100 TB the fact table is the
  * thing you cannot afford to re-aggregate per refresh; the changefeed
  * is (typically) tiny and carries BOTH sides of every change
  * (`old_*`/`new_*` columns), which is exactly what an exact
  * sum/count delta needs:
  *
  *   insert → +new value to the new group,        count +1
  *   delete → −old value from the old group,      count −1
  *   update → −old from old group, +new to new group (handles
  *            group-changing updates — a row moving between groups —
  *            for free)
  *
  * Exactness: the maintained sum lives in DECIMAL (the house
  * exact-decimal accumulator grid), NOT double — decimal addition is
  * associative, so `apply(agg(old), diff) == agg(new)` BIT-EXACTLY
  * (unit-proven; the q187 oracle is the from-scratch GROUP BY over the
  * new snapshot). A double-typed running sum would drift by an ulp per
  * refresh — read faces cast to double at the END, never in the
  * maintained table. Groups whose count reaches zero are dropped,
  * matching the from-scratch result.
  *
  * NULL values are handled exactly: the maintained table tracks
  * `n_vals` (the COUNT of non-null values, the thing SQL `sum`
  * actually averages over) alongside `n_rows`, and the read face
  * emits `sum_value = NULL` whenever `n_vals = 0` — so a group whose
  * surviving values are all NULL reads NULL, bit-matching the
  * from-scratch GROUP BY instead of the 0 a bare coalesce-through-0
  * accumulator would leak (null GROUP keys are fine too; they form
  * their own group like any other).
  *
  * Shape: the feed folds to one row per TOUCHED group (map-side
  * combined), then a full-outer equi-join against the aggregate table
  * — group-cardinality-sized, never fact-sized.
  */
object IncrementalAgg {

  /** Accumulator type of the maintained sum: one integer digit wider
    * than a 10-digit-count sum of DECIMAL(18,6) values can need, and
    * closed under the delta addition below (results cast back).
    */
  val Acc: DecimalType = DecimalType(28, 6)

  /** The maintained aggregate shape:
    * `(groupCol, sum_value, n_vals, n_rows)` — `n_vals` counts
    * NON-NULL values (so an all-NULL group carries sum_value = NULL,
    * like SQL `sum`), `n_rows` counts rows. Build the initial table
    * with this and refresh it with [[applyAggDelta]].
    */
  def sumCountAgg(snapshot: DataFrame, groupCol: String,
                  valueCol: String): DataFrame =
    snapshot.groupBy(col(groupCol))
      .agg(sum(col(valueCol).cast(graft.Exprs.Money)).cast(Acc)
          .as("sum_value"),
        count(col(valueCol)).as("n_vals"),
        count(lit(1)).as("n_rows"))

  /** Fold a snapshotDiff feed (columns `change_type`,
    * `old_<groupCol>`, `new_<groupCol>`, `old_<valueCol>`,
    * `new_<valueCol>`, ...) into `agg` (the [[sumCountAgg]] shape).
    */
  def applyAggDelta(agg: DataFrame, feed: DataFrame, groupCol: String,
                    valueCol: String): DataFrame = {
    // NULL values contribute nothing to __v (sum skips them) but are
    // tracked by the signed non-null indicator __nv, so n_vals stays
    // the exact count SQL `sum` aggregates over.
    val minus = feed
      .filter(col("change_type").isin("delete", "update"))
      .select(col(s"old_$groupCol").as(groupCol),
        (-col(s"old_$valueCol")).as("__v"),
        when(col(s"old_$valueCol").isNotNull, -1L).otherwise(0L).as("__nv"),
        lit(-1L).as("__c"))
    val plus = feed
      .filter(col("change_type").isin("insert", "update"))
      .select(col(s"new_$groupCol").as(groupCol),
        col(s"new_$valueCol").as("__v"),
        when(col(s"new_$valueCol").isNotNull, 1L).otherwise(0L).as("__nv"),
        lit(1L).as("__c"))
    val delta = minus.unionByName(plus)
      .groupBy(col(groupCol))
      .agg(sum(col("__v").cast(graft.Exprs.Money)).cast(Acc).as("__dv"),
        sum(col("__nv")).as("__dnv"),
        sum(col("__c")).as("__dc"))
    val nVals = coalesce(col("n_vals"), lit(0L)) + coalesce(col("__dnv"), lit(0L))
    agg.join(delta, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        // all-NULL group (n_vals = 0) reads NULL, exactly like SQL sum
        when(nVals === 0L, lit(null).cast(Acc))
          .otherwise((coalesce(col("sum_value"), lit(0).cast(Acc)) +
            coalesce(col("__dv"), lit(0).cast(Acc))).cast(Acc))
          .as("sum_value"),
        nVals.as("n_vals"),
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("__dc"), lit(0L)))
          .as("n_rows"))
      .filter(col("n_rows") > 0)
  }
}
