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
        round(col("mae_seasonal") / col("mae_naive1"), 9).as("mase"),
        (col("mae_seasonal") < col("mae_naive1")).as("seasonal_wins"))
  }
}
