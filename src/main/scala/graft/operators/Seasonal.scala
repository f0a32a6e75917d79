package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Seasonal-baseline forecast-error audit (the MASE discipline of
  * Hyndman & Koehler 2006): before anyone ships a revenue forecast,
  * measure what the two zero-parameter baselines already achieve on
  * the series — naive-1 (today = yesterday) and seasonal-naive
  * (today = same weekday last week). The ratio of their errors is the
  * series' seasonality strength, and any real model must beat BOTH
  * numbers to justify existing.
  *
  * Scale shape: the ONLY fact-scale work is the one date-keyed
  * map-side-combinable aggregate building the daily series; both lags
  * are equi-self-joins on the date-domain-sized series (never a
  * global window over facts), and the output is one row.
  * Determinism: daily totals run through the exact-decimal
  * [[graft.Exprs.dsum]]; each absolute error is rounded at 9 dp and
  * folded through `dsum` again; the final ratio is a single rounded
  * division.
  */
object Seasonal {

  /** One-row audit over the daily `dsum(value)` series:
    * `(n_days, n_pairs_1, n_pairs_s, mae_naive1, mae_seasonal, mase,
    * seasonal_wins)` — `mase` = seasonal MAE / naive-1 MAE (< 1 means
    * the weekly pattern is real), each MAE over the days where its lag
    * exists. `season` is in days (default weekly).
    */
  def seasonalNaiveError(df: DataFrame, dateCol: Column, value: Column,
                         season: Int = 7): DataFrame = {
    require(season >= 1, s"season must be >= 1, got $season")
    val daily = df.groupBy(dateCol.as("__d"))
      .agg(graft.Exprs.dsum(value).as("__v"))
    def lagJoin(k: Int): DataFrame =
      daily.join(
        daily.select(date_add(col("__d"), k).as("__d"),
          col("__v").as("__vl")),
        Seq("__d"))
        .select(round(abs(col("__v") - col("__vl")), 9).as("__e"))
        .agg(count(lit(1)).as("n_pairs"),
          (graft.Exprs.dsum(col("__e")) / count(lit(1))).as("mae"))
    val e1 = lagJoin(1)
      .withColumnRenamed("n_pairs", "n_pairs_1")
      .withColumnRenamed("mae", "mae_naive1")
    val es = lagJoin(season)
      .withColumnRenamed("n_pairs", "n_pairs_s")
      .withColumnRenamed("mae", "mae_seasonal")
    daily.agg(count(lit(1)).as("n_days"))
      .crossJoin(e1).crossJoin(es)
      .select(col("n_days"), col("n_pairs_1"), col("n_pairs_s"),
        round(col("mae_naive1"), 9).as("mae_naive1"),
        round(col("mae_seasonal"), 9).as("mae_seasonal"),
        // a perfectly naive-1-predictable series (constant days) has
        // mae_naive1 = 0 — MASE is undefined there, not infinite:
        // explicit NULL, the degenerate-case discipline
        when(col("mae_naive1") > 0,
          round(col("mae_seasonal") / col("mae_naive1"), 9)).as("mase"),
        (col("mae_seasonal") < col("mae_naive1")).as("seasonal_wins"))
  }

  /** One-sided CUSUM drift monitor over the daily series (Page 1954)
    * — the sequential changepoint detector behind "revenue has been
    * quietly running above plan since WHEN?": the classic recursion
    * S_t = max(0, S_{t−1} + x_t − target) looks unparallelizable, but
    * the identity S_t = P_t − min_{j≤t} P_j (P = running sum of
    * deviations) turns it into two cumulative windows over the DAILY
    * series. Those windows ARE single-partition — deliberately: the
    * date domain is calendar-bounded (a century is ~36k rows), the
    * documented B-rows-not-facts exception ([[Ranks]]' offsets
    * discipline); the only fact-scale work is the one date-keyed
    * aggregate building the series.
    *
    * Determinism is structural, not rounded-into: deviations are
    * computed in exact DECIMAL(30,6) (`target` is rounded to the
    * decimal grid first; 30 digits because DAILY totals at 100 TB
    * clear the row-level 10^12 grid), so the running sum and min are
    * EXACT and
    * summation-order-free — no float-accumulation exposure to how an
    * engine implements window aggregation (segment trees vs running
    * fold). `target` defaults to the series mean when NaN is passed;
    * callers with a plan number pass it explicitly. Output: one row
    * per day `(date, value, cusum, alarm)` with `alarm` = cusum >
    * `threshold`.
    */
  def cusumDrift(df: DataFrame, dateCol: Column, value: Column,
                 threshold: Double, target: Double = Double.NaN)
      : DataFrame = {
    // wide exact grid: DAILY totals at 100 TB exceed 10^12, the
    // DECIMAL(18,6) cap (the Theil group-total lesson)
    val money = org.apache.spark.sql.types.DecimalType(30, 6)
    val daily = df.groupBy(dateCol.as("d"))
      .agg(graft.Exprs.dsum(value).as("value"))
    val tgt =
      if (target.isNaN)
        daily.agg((sum(round(col("value"), 9).cast(money)).cast("double") /
          count(lit(1))).as("__tgt"))
      else daily.sparkSession.range(1).select(lit(target).as("__tgt"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("d"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    daily.crossJoin(broadcast(tgt))
      .withColumn("__dev",
        col("value").cast(money) - round(col("__tgt"), 6).cast(money))
      .withColumn("__p", sum(col("__dev")).over(w))
      .withColumn("__m", min(least(col("__p"), lit(0).cast(money))).over(w))
      .select(col("d"), col("value"),
        // the decimal difference is EXACT — cast straight to double
        // (a further round(.., 9) is not a no-op across engines:
        // rounding an already-6-dp value re-rounds the BINARY
        // representation and the engines disagree in the last ulp)
        (col("__p") - col("__m")).cast("double").as("cusum"),
        ((col("__p") - col("__m")).cast("double") > threshold).as("alarm"))
  }
}
