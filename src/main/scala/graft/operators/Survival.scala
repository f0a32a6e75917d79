package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival over user lifetimes — the churn analytic
  * ("how long do users stay active, correcting for the ones still
  * here?") a naive mean-lifetime dashboard gets wrong: users whose
  * lifetime is still RUNNING at the observation edge are right-
  * censored, and dropping or counting them as churned both bias the
  * curve. KM is the standard nonparametric estimator that uses them
  * correctly.
  *
  * Lifetime/censoring contract (deterministic, engine-portable):
  * per user, `duration_days` = days between first and last activity;
  * the observation edge is the GLOBAL max last-activity day of the
  * input; a user whose last activity is MORE than `horizonDays`
  * before that edge has observably churned (death at `duration_days`),
  * anyone active within the horizon is censored (their lifetime is at
  * LEAST `duration_days`). Then the product-limit estimate over
  * distinct durations t: S(t) = Π_{s ≤ t} (1 − d_s / n_s) with d_s
  * deaths at s and n_s = at-risk (neither dead nor censored before s).
  *
  * Scale shape: ONE fact-scale aggregate (per-user min/max day,
  * map-side combinable); everything after lives on the distinct-
  * duration table, bounded by the CALENDAR SPAN in days — the
  * documented B-rows-not-facts exception (the q272 CUSUM daily-series
  * precedent), so its unpartitioned ordered windows are domain-sized,
  * never fact-sized. The observation edge rides a 1-row broadcast.
  *
  * Cross-engine determinism: d and n are exact longs, each survival
  * factor's log is rounded at 12 dp BEFORE the exact decimal
  * cumulative sum (both engines' libm ln/exp agree far past 12 dp;
  * the q284 ln-grain discipline), and the product closes as one
  * exp + round(9). A step where everyone at risk dies (d = n) would
  * be ln(0) = −∞ — Spark's `log` returns NULL there, DuckDB −inf —
  * so that factor is EXCLUDED from the log sum (both engines'
  * sum skips NULL) and a running min(n − d) = 0 guard pins survival
  * to exact 0.0 from that step on.
  *
  * Output: one row per distinct observed duration, ascending:
  * `(duration_days, n_risk, n_events, n_censored, survival)`.
  */
object Survival {

  def kaplanMeier(df: DataFrame, userCol: String, tsCol: String,
                  horizonDays: Int): DataFrame = {
    require(horizonDays >= 0, s"horizonDays must be >= 0, got $horizonDays")
    val peru = df
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(userCol).as("__u"))
      .agg(min(to_date(col(tsCol))).as("__f"),
        max(to_date(col(tsCol))).as("__l"))
    val edge = peru.agg(max(col("__l")).as("__mx"))
    val lab = peru.crossJoin(broadcast(edge))
      .select(datediff(col("__l"), col("__f")).cast("long").as("__dur"),
        when(datediff(col("__mx"), col("__l")) > horizonDays, 1L)
          .otherwise(0L).as("__ev"))
    val agg = lab.groupBy(col("__dur"))
      .agg(sum(col("__ev")).as("__d"),
        (count(lit(1)) - sum(col("__ev"))).as("__c"))
    val tot = lab.agg(count(lit(1)).as("__n"))
    // day-domain table from here down: ≤ calendar-span rows, the
    // B-rows exception — these global windows never see fact scale
    val before = Window.orderBy(col("__dur"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val upTo = Window.orderBy(col("__dur"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risk = agg.crossJoin(broadcast(tot))
      .withColumn("__nr",
        col("__n") - coalesce(sum(col("__d") + col("__c")).over(before),
          lit(0L)))
    // log-grain factor: NULL when d = n (Spark log(0) is NULL; the
    // sum skips it and the zero guard below owns that step onward)
    val lnF = when(col("__d") < col("__nr"),
      round(log(lit(1.0) - col("__d").cast("double") / col("__nr")), 12)
        .cast("decimal(18,12)"))
    risk
      .withColumn("__sln", sum(lnF).over(upTo))
      .withColumn("__zero", min(col("__nr") - col("__d")).over(upTo))
      .select(col("__dur").as("duration_days"), col("__nr").as("n_risk"),
        col("__d").as("n_events"), col("__c").as("n_censored"),
        when(col("__zero") === 0, lit(0.0))
          .otherwise(round(exp(coalesce(col("__sln").cast("double"),
            lit(0.0))), 9)).as("survival"))
  }
}
