package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Closed-form grouped simple linear regression — the "is there a
  * trend and how steep" primitive of every metrics review (price vs
  * quantity elasticity per return-flag, revenue vs day index per
  * region), fit exactly from the five sufficient statistics instead
  * of an iterative solver: slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²),
  * intercept = (Σy − slope·Σx)/n, and r² as the squared correlation.
  *
  * Scale shape: ONE fact-scale map-side-combinable groupBy — the five
  * sums ride a single aggregate; there is no second pass, no window,
  * no collect, and the output is one row per group. Determinism: each
  * product term is rounded at 9 dp and folded through the
  * exact-decimal [[graft.Exprs.dsum]] (order-independent); the
  * closing algebra is single-valued doubles. A group with zero
  * x-variance has no regression line — slope/intercept/r2 come back
  * NULL (never an ANSI divide error); a zero-variance y (flat line)
  * yields slope 0 with NULL r².
  */
object Ols {

  /** One row per group: `(group, n, slope, intercept, r2)`. Null x or
    * y rows are excluded pairwise.
    */
  def fitGrouped(df: DataFrame, groupName: String, group: Column,
                 xCol: Column, yCol: Column): DataFrame = {
    val x = xCol.cast("double")
    val y = yCol.cast("double")
    val s = df.filter(x.isNotNull && y.isNotNull)
      .groupBy(group.as(groupName))
      .agg(count(lit(1)).as("n"),
        graft.Exprs.dsum(round(x, 9)).as("__sx"),
        graft.Exprs.dsum(round(y, 9)).as("__sy"),
        graft.Exprs.dsum(round(x * y, 9)).as("__sxy"),
        graft.Exprs.dsum(round(x * x, 9)).as("__sxx"),
        graft.Exprs.dsum(round(y * y, 9)).as("__syy"))
    val n = col("n").cast("double")
    val vx = n * col("__sxx") - col("__sx") * col("__sx")
    val vy = n * col("__syy") - col("__sy") * col("__sy")
    val cov = n * col("__sxy") - col("__sx") * col("__sy")
    val slope = when(vx > 0, round(cov / vx, 9))
    s.select(col(groupName), col("n"),
      slope.as("slope"),
      when(vx > 0,
        round((col("__sy") - (cov / vx) * col("__sx")) / n, 9))
        .as("intercept"),
      when(vx > 0 && vy > 0, round(cov * cov / (vx * vy), 9)).as("r2"))
  }
}
