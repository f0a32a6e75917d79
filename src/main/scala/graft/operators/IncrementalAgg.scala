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
  * PRECONDITION: `valueCol` must be non-null. The maintained sum
  * coalesces through 0, so a group whose surviving values were all
  * NULL would read sum_value = 0 where the from-scratch GROUP BY
  * reads NULL — the bit-exact contract holds only for non-null value
  * columns (null GROUP keys are fine; they form their own group like
  * any other). Feeds from measures that can be null should
  * `coalesce`/filter upstream, the same rule every decimal
  * accumulator in this library applies.
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

  /** The maintained aggregate shape: `(groupCol, sum_value, n_rows)`.
    * Build the initial table with this and refresh it with
    * [[applyAggDelta]].
    */
  def sumCountAgg(snapshot: DataFrame, groupCol: String,
                  valueCol: String): DataFrame =
    snapshot.groupBy(col(groupCol))
      .agg(sum(col(valueCol).cast(graft.Exprs.Money)).cast(Acc)
          .as("sum_value"),
        count(lit(1)).as("n_rows"))

  /** Fold a snapshotDiff feed (columns `change_type`,
    * `old_<groupCol>`, `new_<groupCol>`, `old_<valueCol>`,
    * `new_<valueCol>`, ...) into `agg` (the [[sumCountAgg]] shape).
    */
  def applyAggDelta(agg: DataFrame, feed: DataFrame, groupCol: String,
                    valueCol: String): DataFrame = {
    val minus = feed
      .filter(col("change_type").isin("delete", "update"))
      .select(col(s"old_$groupCol").as(groupCol),
        (-col(s"old_$valueCol")).as("__v"), lit(-1L).as("__c"))
    val plus = feed
      .filter(col("change_type").isin("insert", "update"))
      .select(col(s"new_$groupCol").as(groupCol),
        col(s"new_$valueCol").as("__v"), lit(1L).as("__c"))
    val delta = minus.unionByName(plus)
      .groupBy(col(groupCol))
      .agg(sum(col("__v").cast(graft.Exprs.Money)).cast(Acc).as("__dv"),
        sum(col("__c")).as("__dc"))
    agg.join(delta, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        (coalesce(col("sum_value"), lit(0).cast(Acc)) +
          coalesce(col("__dv"), lit(0).cast(Acc))).cast(Acc)
          .as("sum_value"),
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("__dc"), lit(0L)))
          .as("n_rows"))
      .filter(col("n_rows") > 0)
  }
}
