package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Theil T inequality index with exact between/within-group
  * decomposition (Theil 1967) — the concentration statistic the Gini
  * (q241) cannot decompose: T = T_between + Σ_g share_g · T_g
  * additively splits "how unequal is revenue" into "because groups
  * differ" vs "because members within a group differ", which is the
  * question a marketplace health dashboard actually asks ("is revenue
  * concentration a nation story or a whale story?").
  *
  * Scale shape: ONE fact-scale map-side-combinable groupBy carrying
  * the three per-group sufficient statistics (N_g, ΣX in exact
  * decimal, Σ x·ln x as 9-dp-rounded terms in exact decimal);
  * everything after runs on the group-domain-sized table. Using
  * Σ x ln x, the group and total indices are closed forms:
  * T = (Σ x ln x)/X − ln(X/N), so no second corpus pass exists.
  *
  * Determinism: per-row ln rounded at 9 dp, all sums through the
  * exact-decimal [[graft.Exprs.dsum]] family; closing divisions are
  * single-valued doubles. Rows with `value ≤ 0` are excluded (Theil
  * is defined on positive quantities). `theil_within` is emitted as
  * `theil_total − theil_between` — the decomposition identity, exact
  * by construction. Output: one row
  * `(n, n_groups, theil_total, theil_between, theil_within)`.
  */
object Theil {

  def decomposition(df: DataFrame, group: Column, value: Column)
      : DataFrame = {
    val x = value.cast("double")
    val perGroup = df.filter(x > 0)
      .groupBy(group.as("__g"))
      .agg(count(lit(1)).as("__n"),
        graft.Exprs.dsum(x).as("__xg"),
        graft.Exprs.dsum(round(x * round(log(x), 9), 9)).as("__sg"))
    // group TOTALS exceed the row-level DECIMAL(18,6) grid long before
    // any row does (a 10^12-revenue nation overflowed the cast at soak
    // zipf10) — the 25-row re-aggregate sums on a wider exact grid
    val wide = org.apache.spark.sql.types.DecimalType(30, 6)
    val tot = perGroup.agg(
      sum(col("__n")).as("n"),
      count(lit(1)).as("n_groups"),
      sum(round(col("__xg"), 9).cast(wide)).cast("double").as("__x"),
      sum(round(col("__sg"), 9).cast(wide)).cast("double").as("__s"))
    val between = perGroup.crossJoin(broadcast(tot))
      .select(round((col("__xg") / col("__x")) *
        round(log((col("__xg") / col("__x")) /
          (col("__n").cast("double") / col("n"))), 9), 9).as("__t"))
      .agg(graft.Exprs.dsum(col("__t")).as("__between"))
    val total = round(col("__s") / col("__x") -
      round(log(col("__x") / col("n")), 9), 9)
    tot.crossJoin(between).select(
      col("n"), col("n_groups"),
      total.as("theil_total"),
      round(col("__between"), 9).as("theil_between"),
      round(total - round(col("__between"), 9), 9).as("theil_within"))
  }
}
