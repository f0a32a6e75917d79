package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Recency-weighted aggregation — the freshness signal feature stores
  * and data-mixture schedulers use: an event's contribution halves
  * every `halfLifeDays`, so a key's decayed mass tracks CURRENT
  * activity instead of lifetime totals (stale domains/users fade out
  * without a hard cutoff window).
  *
  * Determinism across engines (the house discipline): the decay weight
  * is quantized to whole half-lives, so it is an EXACT reciprocal
  * power of two built by integer shift — `1.0 / (1L << k)` — never a
  * transcendental `pow`/`exp` whose last-ulp behavior differs between
  * libm implementations. `k` caps at 62 (weight 2⁻⁶² ≈ 2e-19 — decayed
  * to nothing) to keep the shift in range. Per-event products are
  * rounded once into DECIMAL(30,15) and summed exactly, so the result
  * is order-independent on any partitioning.
  *
  * Scale shape: one projection pass plus ONE map-side-combinable
  * groupBy; the as-of anchor (max event date) rides along as a 1-row
  * cross join, never a driver collect.
  */
object Decay {
  private val Acc = DecimalType(30, 15)

  /** Per-key half-life-decayed sum of `valueCol` anchored at the
    * corpus' max event date. Output: (keyCol, decayed_value, n_events).
    */
  def halfLifeAgg(df: DataFrame, keyCol: String, tsCol: String,
                  valueCol: String, halfLifeDays: Int): DataFrame = {
    require(halfLifeDays >= 1, s"halfLifeDays must be >= 1, got $halfLifeDays")
    val asOf = df.agg(max(to_date(col(tsCol))).as("as_of"))
    df.select(col(keyCol), to_date(col(tsCol)).as("__d"),
        col(valueCol).as("__v"))
      .crossJoin(asOf)
      .withColumn("__k",
        expr(s"greatest(datediff(as_of, __d), 0) div $halfLifeDays"))
      .withColumn("__w", expr(
        "1.0 / cast(shiftleft(cast(1 as bigint), " +
          "cast(least(__k, 62) as int)) as double)"))
      .groupBy(col(keyCol))
      .agg(sum((col("__v") * col("__w")).cast(Acc)).cast("double")
          .as("decayed_value"),
        count(lit(1)).as("n_events"))
  }
}
