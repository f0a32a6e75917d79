package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic experiment readout — the A/B analysis an e-commerce
  * events pipeline runs on itself: assign every user to a variant by
  * the engine-portable [[Sample.hashMod2]] (a pure function of the
  * user id and the experiment seed, so any engine — and the oracle —
  * re-derives the same split; `rand()`-based assignment is neither
  * replayable nor stable across file layouts), then test the
  * conversion-rate difference with the standard two-proportion pooled
  * z-test.
  *
  * Scale shape: ONE user-keyed shuffle (the per-user converted-or-not
  * rollup, map-side combinable), then a 2-row variant table and a
  * single output row — nothing after the first aggregate is
  * fact-scale. Determinism: counts are exact longs; the rates, lift,
  * and z-statistic are single-valued double expressions (no
  * aggregation-order exposure) rounded at 9 dp.
  */
object Experiment {

  /** |z| bound for two-sided significance at α = 0.01. */
  val CriticalZ: Double = 2.575829

  /** One-row readout: per-variant users/conversions/rates, absolute
    * lift (B − A), pooled z-statistic, and the α = 0.01 verdict.
    * `convert` marks a converting EVENT; a user counts as converted
    * if any of their events matches. Ids must be nonnegative (the
    * [[Sample]] id contract).
    */
  def abConversionLift(events: DataFrame, userCol: String,
                       convert: Column, seed: Long = 0L,
                       critical: Double = CriticalZ): DataFrame = {
    val users = events
      .groupBy(col(userCol).as("__u"))
      .agg(max(when(convert, 1L).otherwise(0L)).as("__conv"))
      .withColumn("__v", Sample.hashMod2(col("__u"), 2L, seed))
    val byVariant = users.groupBy(col("__v"))
      .agg(count(lit(1)).as("__n"), sum(col("__conv")).as("__x"))
    val row = byVariant.agg(
      sum(when(col("__v") === 0, col("__n")).otherwise(0L)).as("n_a"),
      sum(when(col("__v") === 0, col("__x")).otherwise(0L)).as("conv_a"),
      sum(when(col("__v") === 1, col("__n")).otherwise(0L)).as("n_b"),
      sum(when(col("__v") === 1, col("__x")).otherwise(0L)).as("conv_b"))
    val pa = col("conv_a").cast("double") / col("n_a")
    val pb = col("conv_b").cast("double") / col("n_b")
    val pooled = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b"))
    // degenerate pooled rate (nobody or everybody converted) has zero
    // variance — the z-statistic is undefined there, not infinite:
    // emit NULL and a false verdict instead of an ANSI divide-by-zero
    val z = when(
      col("conv_a") + col("conv_b") > 0 &&
        col("conv_a") + col("conv_b") < col("n_a") + col("n_b"),
      round((pb - pa) /
        sqrt(pooled * (lit(1.0) - pooled) *
          (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), 9))
    row.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      round(pa, 9).as("rate_a"), round(pb, 9).as("rate_b"),
      round(pb - pa, 9).as("lift"), z.as("z_stat"),
      coalesce(abs(z) > critical, lit(false)).as("significant"))
  }
}
