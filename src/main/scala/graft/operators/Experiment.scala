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

  /** Exact ROC-AUC of a score against a binary label — the
    * classifier-audit number behind every quality-filter threshold
    * decision ("does the fasttext-style quality score actually rank
    * kept docs above dropped ones?"). Computed by the Mann–Whitney
    * rank formulation with exact MIDRANK tie handling: AUC =
    * P(score⁺ > score⁻) + ½·P(score⁺ = score⁻), equivalently
    * Σ_v p(v)·(2·Q_below(v) + q(v)) / (2·P·Q) over the distinct score
    * values v with p/q the positive/negative counts at v and Q_below
    * the negatives strictly below.
    *
    * Scale shape: ONE fact-scale aggregate (per-distinct-score
    * pos/neg counts, map-side combinable), then [[Ranks.prefixSum]]
    * for Q_below — the bucket-distributed exact prefix sum, because a
    * continuous score column's distinct support IS fact-scale and a
    * global `sum() OVER (ORDER BY score)` would single-task it (the
    * same funnel [[graft.operators.Ranks]] exists to kill; the
    * Wasserstein operator's discipline) — and one closing ungrouped
    * aggregate. The numerator folds in DECIMAL(18,0) products summed
    * to DECIMAL(38,0): at 10¹² rows per class the sum reaches ~10²⁴,
    * past LONG — the r15 Theil decimal-grid lesson applied BEFORE the
    * soak catches it this time.
    *
    * Degenerate contract: one row always (ungrouped closing
    * aggregate); a single-class input (P = 0 or Q = 0) emits NULL auc
    * — the statistic is undefined, not 0 or 1.
    * Output: `(n_pos, n_neg, auc)`.
    */
  def rocAuc(df: DataFrame, label: Column, score: Column): DataFrame = {
    // fan BY THE GROUPING KEY (scan-parallelism floor, Par.fan): the
    // score aggregate then reuses the fan's partitioning — one
    // exchange total — and its map side runs wide instead of at the
    // scan's task count. No-op at scale.
    val byScore = Par.fan(
      df.filter(label.isNotNull && score.isNotNull)
        .select(when(label.cast("boolean"), 1L).otherwise(0L).as("__y"),
          score.cast("double").as("__s")), col("__s"))
      .groupBy(col("__s"))
      .agg(sum(col("__y")).as("__p"),
        (count(lit(1)) - sum(col("__y"))).as("__q"))
    val pre = Ranks.prefixSum(byScore, "__s", "__q", ascending = true,
      out = "__qb")
    val totals = pre.agg(
      sum(col("__p")).as("n_pos"), sum(col("__q")).as("n_neg"),
      sum(col("__p").cast("decimal(18,0)") *
        (lit(2) * col("__qb") + col("__q")).cast("decimal(18,0)"))
        .as("__numer2"))
    totals.select(col("n_pos"), col("n_neg"),
      when(col("n_pos") > 0 && col("n_neg") > 0,
        round(col("__numer2").cast("double") /
          (lit(2.0) * col("n_pos") * col("n_neg")), 9)).as("auc"))
  }

  /** Poisson(1) weight on a ppm grid from the portable hash — the
    * inverse-CDF cutoffs (truncated at 7, where the tail mass is
    * under 1e-7) as exact INTEGER compares, so Scala and SQL derive
    * byte-identical weights with no float in sight.
    */
  private def poissonW(u: Column): Column =
    when(u < 367879, 0L).when(u < 735759, 1L).when(u < 919699, 2L)
      .when(u < 981012, 3L).when(u < 996340, 4L).when(u < 999406, 5L)
      .when(u < 999917, 6L).otherwise(7L)

  /** Deterministic Poisson-bootstrap confidence interval for a mean —
    * the error bar a 100 TB aggregate should ship with ("daily mean
    * order value 182.40 ± what?"), computed WITHOUT resampling passes:
    * the classic n-out-of-n bootstrap is undistributable (each
    * resample is a global multinomial draw), but the Poisson
    * bootstrap replaces it with an independent per-row Poisson(1)
    * weight per replicate — and with the weight drawn from the seeded
    * portable hash of (row id, replicate) on a ppm grid
    * ([[Sample.hashMod2]]'s arithmetic, [[poissonW]]'s integer
    * cutoffs) the whole procedure is a pure function of the data:
    * any engine, any partitioning, any rerun derives the identical
    * interval, and the DuckDB oracle replays it exactly.
    *
    * Scale shape: ONE fact-scale pass — each row explodes to its `b`
    * (replicate, weight) pairs, but partial aggregation collapses
    * them map-side, so the SHUFFLE carries ≤ b rows per partition,
    * never b× the data (the explode costs CPU only; the alternative —
    * b parallel aggregate columns in one projection — keeps one scan
    * but stresses codegen past b ≈ 100, and was not measurably
    * faster at b = 64). Plus one plain aggregate for the overall
    * mean: the input is scanned twice, both scans pruned to the two
    * needed columns (callers with an EXPENSIVE upstream persist it
    * first, the repo-wide contract). Everything after lives on the
    * b-row replicate table — the B-rows exception.
    *
    * Replicate means are exact decimal sums with one rounded double
    * division ([[graft.Exprs]] discipline); the interval is the
    * nearest-rank (type-1) quantile pair at `alphaPpm` each side —
    * k_lo = ceil(b_eff·α) by integer arithmetic, k_hi symmetric — so
    * no interpolation float can drift. A replicate whose weights all
    * land 0 (only possible at toy n) has no mean and is EXCLUDED;
    * `b_eff` reports how many survived. Output row (always exactly
    * one): `(n, mean, ci_lo, ci_hi, b_eff)`.
    */
  def bootstrapMeanCI(df: DataFrame, id: Column, value: Column,
                      b: Int = 64, seed: Long = 0L,
                      alphaPpm: Long = 25000L): DataFrame = {
    require(b >= 2 && b <= 4096, s"b must be in [2, 4096], got $b")
    require(alphaPpm > 0 && alphaPpm < 500000,
      s"alphaPpm must be in (0, 5e5), got $alphaPpm")
    require(seed >= 0 && seed + b <= 60000000000L,
      s"seed+b must stay in hashMod2's [0, 6e10] bound, got $seed + $b")
    // scan-parallelism floor (Par.fan): the b-way explode below
    // multiplies every base row — on a single-file input that whole
    // fact-scale expansion (and the overall-mean pass) would run on
    // one core. Fan the COMPACT pre-explode rows (§2.3); no-op at
    // scale.
    val base = Par.fan(
      df.filter(id.isNotNull && value.isNotNull)
        .select(id.as("__id"), value.cast(graft.Exprs.Money).as("__x")),
      col("__id"))
    val overall = base.agg(count(lit(1)).as("n"),
      graft.Exprs.davg(col("__x")).as("__mean"))
    // per-(row, replicate) hash -> ppm -> Poisson weight; seed varies
    // by replicate exactly as hashMod2 varies by seed
    val u = pmod((col("__id") % Sample.Prime) *
        (lit(Sample.Mult + seed) + col("__j")) % Sample.Prime2 *
        Sample.Mult2, lit(1000000L))
    val means = base
      .select(col("__id"), col("__x"),
        explode(sequence(lit(0L), lit(b - 1L))).as("__j"))
      .select(col("__j"), col("__x"), poissonW(u).as("__w"))
      // w = 0 adds nothing to either sum — dropping those rows before
      // the aggregate saves the ~37% of decimal adds the Poisson(1)
      // zero cell would burn (a replicate whose EVERY weight is 0
      // then has no group at all, which the NULL-mean exclusion below
      // already treats identically to __sw = 0)
      .filter(col("__w") > 0)
      .groupBy(col("__j"))
      // w rides as DECIMAL(1,0): a LongType w promotes to (20,0) and
      // pushes the product past precision 38, off Decimal's
      // compact-long fast path — (1,0)x(18,6) stays on it
      .agg(sum(col("__w").cast("decimal(1,0)") * col("__x")).as("__sx"),
        sum(col("__w")).as("__sw"))
      .select(col("__j"), when(col("__sw") > 0,
        round(col("__sx").cast("double") / col("__sw"), 9)).as("__m"))
    // b rows, but the lineage above them is the fact-scale explode —
    // both the count and the rank read this table, so materialize it
    // once (the jsDivergence multi-read lesson; measured 2x on the
    // zipf10 soak without it)
    val ok = means.filter(col("__m").isNotNull).localCheckpoint(true)
    val beff = ok.agg(count(lit(1)).as("__beff"))
    // b-row table: rank, then pick the nearest-rank quantile pair
    val ranked = ok.withColumn("__r", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("__m"), col("__j"))))
    val ci = ranked.crossJoin(broadcast(beff))
      .withColumn("__klo",
        expr(s"CAST((__beff * $alphaPpm + 999999) div 1000000 AS BIGINT)"))
      .withColumn("__khi", col("__beff") - col("__klo") + 1)
      .agg(max(when(col("__r") === col("__klo"), col("__m"))).as("ci_lo"),
        max(when(col("__r") === col("__khi"), col("__m"))).as("ci_hi"),
        coalesce(max(col("__beff")), lit(0L)).as("b_eff"))
    overall.crossJoin(ci).select(col("n"),
      when(col("n") > 0, round(col("__mean"), 9)).as("mean"),
      col("ci_lo"), col("ci_hi"), col("b_eff"))
  }
}
