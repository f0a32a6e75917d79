package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benford's-law first-digit audit — the classic forensic screen for
  * fabricated or systematically manipulated amount columns (Benford
  * 1938; Nigrini's fraud-audit formulation): naturally occurring
  * multi-magnitude amounts put digit d first with probability
  * log₁₀(1 + 1/d), and a segment whose invoices were invented, capped,
  * or split-to-dodge-approval drifts measurably off that curve. Run it
  * per segment/merchant/priority so one polluted partner shows up
  * instead of drowning in the corpus-wide aggregate.
  *
  * Scale shape: ONE map-side-combinable groupBy on
  * `(group, first_digit)` is the only fact-scale exchange; everything
  * after — totals, the 9-digit densification, the χ² fold — runs on
  * the group×digit-domain-sized count table. The audit's output is one
  * row per group, never per input row.
  *
  * Determinism (oracle-replayable): the first digit is taken from the
  * DECIMAL STRING of the floored amount (no log10-of-double boundary
  * wobble at exact powers of ten); expected shares are
  * `round(log10(1 + 1/d), 9)`; each digit's χ² term is rounded at
  * 9 dp and the per-group total runs through the exact-decimal
  * [[graft.Exprs.dsum]]. Zero-count digits still contribute their
  * full expected mass (the densification join), as the statistic
  * requires. Rows with `amount < 1` are excluded — they have no
  * leading integer digit; Benford screening applies to
  * multi-magnitude positive amounts.
  */
object Benford {

  /** χ²(df=8) critical value at α = 0.01 — the conventional "flag for
    * human review" bound for a 9-cell first-digit test.
    */
  val CriticalChi2: Double = 20.09

  /** Per-group audit: `(group, n, chi2, suspect)` — `n` the audited
    * row count, `chi2` the 9-digit Pearson statistic against Benford
    * expectation, `suspect` whether it clears [[CriticalChi2]]
    * (callers with a different α pass their own bound).
    */
  def firstDigitAudit(df: DataFrame, groupName: String, group: Column,
                      amount: Column,
                      critical: Double = CriticalChi2): DataFrame = {
    val f = df.filter(amount >= 1)
      .select(group.as("__g"),
        substring(floor(amount).cast("long").cast("string"), 1, 1)
          .cast("int").as("__d"))
    val counts = f.groupBy(col("__g"), col("__d"))
      .agg(count(lit(1)).as("__cnt"))
    val totals = counts.groupBy(col("__g")).agg(sum(col("__cnt")).as("n"))
    // densify: every group carries all nine digits — an absent digit
    // is evidence (its whole expected mass enters the statistic), not
    // a skipped term
    val dense = totals
      .select(col("__g"), col("n"),
        explode(sequence(lit(1), lit(9))).as("__d"))
      .join(counts, Seq("__g", "__d"), "left")
      .withColumn("__cnt", coalesce(col("__cnt"), lit(0L)))
    val expected = col("n") * round(log10(lit(1.0) + lit(1.0) / col("__d")), 9)
    val term = round((col("__cnt") - expected) * (col("__cnt") - expected)
      / expected, 9)
    dense.select(col("__g"), col("n"), term.as("__t"))
      .groupBy(col("__g").as(groupName), col("n"))
      .agg(graft.Exprs.dsum(col("__t")).as("chi2"))
      .withColumn("suspect", col("chi2") > critical)
  }
}
