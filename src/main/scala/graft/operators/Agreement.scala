package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Inter-annotator agreement — the labeled-data QA step of an
  * RLHF/eval-set pipeline: before preference labels or quality
  * annotations train anything, measure whether the raters (human or
  * model-as-judge) agree beyond chance. Cohen's kappa for two raters,
  * Fleiss' kappa for a fixed-size rater panel.
  *
  * Scale shape: both statistics collapse the corpus in ONE map-side-
  * combinable aggregation pass (a (catA, catB) contingency grid for
  * Cohen; an (item, category) count grid for Fleiss whose second pass
  * groups the |items|-sized grid, never raw ratings twice); everything
  * after the first aggregate is category-vocabulary-sized. No windows,
  * no driver collects — the result is a one-row frame.
  *
  * Determinism: all tallies are exact integers; chance-agreement
  * products go through DECIMAL(38,0)/DECIMAL(30,15) exact sums
  * (category-order-independent), and the handful of closing IEEE
  * divisions is written in the same operand order as the SQL twin.
  *
  * Beyond-reference LLM-pipeline operator (the q224/q227 family):
  * annotation QA has no analogue in the reference's order pipeline.
  */
object Agreement {
  private val Acc = DecimalType(30, 15)

  /** Cohen's kappa between two categorical rater columns over the same
    * rows. Output: one row (n, po, pe, kappa), ratios rounded to 9 dp.
    * Rows where either rating is NULL are excluded (an unrated item
    * carries no agreement signal).
    *
    * kappa = (po - pe) / (1 - pe) with po = observed agreement rate and
    * pe = Σ_k marginalA_k · marginalB_k / n² the chance rate. Marginal
    * products are summed in DECIMAL(38,0) — exact at any corpus size
    * (two 10^12-row marginals overflow a BIGINT product).
    *
    * Degenerate case, pinned: when BOTH raters are constant (pe = 1 —
    * chance agreement is total, kappa's denominator vanishes) kappa is
    * mathematically undefined and this returns NULL explicitly via a
    * `pe < 1` guard — never NaN from a 0/0 slipping through IEEE.
    *
    * The one-row result is eagerly materialized (localCheckpoint) so
    * the contingency-grid cache can be dropped before returning —
    * no cache blocks outlive the call.
    */
  def cohenKappa(df: DataFrame, raterA: String, raterB: String): DataFrame = {
    // persisted: the grid feeds THREE aggregates (totals + both
    // marginals) — without the cache each one re-scans the raw input,
    // 3 corpus passes instead of 1. The cached table itself is only
    // |catA|·|catB| rows.
    val grid = df
      .filter(col(raterA).isNotNull && col(raterB).isNotNull)
      .groupBy(col(raterA).as("ca"), col(raterB).as("cb"))
      .agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = grid.agg(
      sum("cnt").as("n"),
      sum(when(col("ca") === col("cb"), col("cnt")).otherwise(0L))
        .as("agree"))
    val ma = grid.groupBy("ca").agg(sum("cnt").as("na"))
    val mb = grid.groupBy("cb").agg(sum("cnt").as("nb"))
    val prod = ma.join(mb, col("ca") === col("cb"))
      .agg(sum(col("na").cast(DecimalType(19, 0)) *
        col("nb").cast(DecimalType(19, 0))).as("sp"))
    val po = col("agree").cast("double") / col("n").cast("double")
    val pe = col("sp").cast("double") / col("n").cast("double") /
      col("n").cast("double")
    val out = tot.crossJoin(prod).select(
      col("n"),
      round(po, 9).as("po"),
      round(pe, 9).as("pe"),
      when(pe < 1.0, round((po - pe) / (lit(1.0) - pe), 9)).as("kappa"))
      .localCheckpoint(true)
    grid.unpersist()
    out
  }

  /** Fleiss' kappa over long-form ratings (itemCol, categoryCol), a
    * panel of exactly `m` ratings per item — items with a different
    * rating count are excluded (Fleiss is undefined for ragged panels;
    * the filter makes partial coverage usable instead of fatal).
    * Output: one row (n_items, p_bar, pe_bar, kappa), 9 dp.
    *
    * P_i = (Σ_k n_ik² − m) / (m(m−1)) per item; P̄ = mean; the chance
    * rate P̄e = Σ_k p_k² with p_k the pooled category share. Σ n_ik²
    * stays integer-exact; the p_k² terms are squared in decimal and
    * exact-summed (category-order-independent).
    *
    * Degenerate case, pinned: when every rating across the panel lands
    * in ONE category, P̄e = 1 and kappa is undefined — returned as an
    * explicit NULL via a `pe < 1` guard (see [[cohenKappa]]). Caches
    * are dropped before returning (one-row result, eagerly
    * materialized).
    */
  def fleissKappa(ratings: DataFrame, itemCol: String, categoryCol: String,
                  m: Int): DataFrame = {
    require(m >= 2, s"a rater panel needs m >= 2, got $m")
    // persisted: ic feeds the per-item rollup AND the pooled category
    // counts — two raw-ratings scans without the cache
    val ic = ratings.filter(col(categoryCol).isNotNull)
      .groupBy(col(itemCol).as("item"), col(categoryCol).as("cat"))
      .agg(count(lit(1)).as("nik"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // keep only complete panels; the grid is |items|·|cats|-sized,
    // grouped once more on item — ratings are never re-scanned
    val perItem = ic.groupBy("item").agg(
      sum("nik").as("mi"),
      sum(col("nik") * col("nik")).as("sq"))
      .filter(col("mi") === m)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val itemsAgg = perItem.agg(
      count(lit(1)).as("n_items"),
      sum("sq").as("ssq"))
    val pooled = ic.join(perItem.select("item"), Seq("item"))
      .groupBy("cat").agg(sum("nik").as("nk"))
    val tot = itemsAgg.crossJoin(
      pooled.crossJoin(itemsAgg.select(col("n_items").as("ni2")))
        .agg(sum(((col("nk").cast("double")
          / (col("ni2") * m).cast("double"))
          * (col("nk").cast("double") / (col("ni2") * m).cast("double")))
          .cast(Acc)).cast("double").as("pe")))
    val pBar = (col("ssq") - col("n_items") * m).cast("double") /
      (col("n_items") * m * (m - 1)).cast("double")
    val out = tot.select(
      col("n_items"),
      round(pBar, 9).as("p_bar"),
      round(col("pe"), 9).as("pe_bar"),
      when(col("pe") < 1.0,
        round((pBar - col("pe")) / (lit(1.0) - col("pe")), 9)).as("kappa"))
      .localCheckpoint(true)
    ic.unpersist()
    perItem.unpersist()
    out
  }

  /** Krippendorff's alpha (nominal metric) over long-form ratings
    * (itemCol, categoryCol) — the agreement coefficient for RAGGED
    * panels, which is the shape real annotation queues produce:
    * raters abstain, time out, or join late, so items carry anywhere
    * from 1 to R ratings. [[fleissKappa]] must DROP every incomplete
    * item; alpha keeps them all (items with a single rating carry no
    * pairable information and are excluded by the mathematics itself,
    * not by a completeness filter). α = 1 − D_o/D_e over the
    * coincidence matrix (Krippendorff 2004).
    *
    * The coincidence matrix never materializes: for the nominal
    * metric its whole contribution collapses to per-item counts —
    * the disagreeing ordered pairs of an item are
    * m_i(m_i−1) − Σ_k n_ik(n_ik−1), each item weighted 1/(m_i−1),
    * and the chance term needs only the pooled category totals over
    * pairable items. So the plan is ONE fact-scale (item, category)
    * aggregate, an |items|-sized rollup, and a category-vocabulary
    * tail — the [[fleissKappa]] scale discipline exactly.
    *
    * Determinism: pair counts are exact integers; the per-item
    * 1/(m_i−1) weighting is the one rational step — rounded at 9 dp
    * and folded through the exact-decimal [[graft.Exprs.dsum]];
    * pooled products stay in DECIMAL(19,0). Degenerate case, pinned:
    * one category across all pairable ratings ⇒ D_e = 0 ⇒ alpha
    * undefined ⇒ explicit NULL (the [[cohenKappa]] guard), never a
    * NaN or an ANSI divide error. Output: one row
    * `(n_items, n_ratings, do_rate, de_rate, alpha)`, 9 dp.
    */
  def krippendorffAlpha(ratings: DataFrame, itemCol: String,
                        categoryCol: String): DataFrame = {
    // persisted: the (item, cat) grid feeds the per-item rollup AND
    // the pooled category totals — two grid scans, one ratings scan
    val ic = ratings.filter(col(categoryCol).isNotNull)
      .groupBy(col(itemCol).as("item"), col(categoryCol).as("cat"))
      .agg(count(lit(1)).as("nik"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val perItem = ic.groupBy("item").agg(
      sum("nik").as("mi"),
      sum(col("nik") * (col("nik") - 1)).as("samePairs"))
      .filter(col("mi") >= 2) // single-rating items have no pairs
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Σ_i [m_i(m_i−1) − Σ_k n_ik(n_ik−1)] / (m_i−1), 9-dp terms in
    // exact decimal; n = Σ m_i over pairable items
    val obs = perItem.select(
      round((col("mi") * (col("mi") - 1) - col("samePairs"))
        .cast("double") / (col("mi") - 1).cast("double"), 9).as("__t"),
      col("mi"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("mi")).as("n"),
        graft.Exprs.dsum(col("__t")).as("doNum"))
    val pooled = ic.join(perItem.select("item"), Seq("item"))
      .groupBy("cat").agg(sum("nik").as("nk"))
      .agg(sum(col("nk").cast(DecimalType(19, 0)) *
        (col("nk") - 1).cast(DecimalType(19, 0))).as("sameTot"))
    val doRate = col("doNum") / col("n").cast("double")
    // n(n−1) in exact decimal — a 10^12-rating corpus overflows the
    // BIGINT product (the cohenKappa marginal discipline)
    val totPairs = col("n").cast(DecimalType(19, 0)) *
      (col("n") - 1).cast(DecimalType(19, 0))
    val deRate = (totPairs - col("sameTot")).cast("double") /
      totPairs.cast("double")
    val out = obs.crossJoin(pooled).select(
      col("n_items"), col("n").as("n_ratings"),
      round(doRate, 9).as("do_rate"),
      round(deRate, 9).as("de_rate"),
      when(deRate > 0.0,
        round(lit(1.0) - doRate / deRate, 9)).as("alpha"))
      .localCheckpoint(true)
    ic.unpersist()
    perItem.unpersist()
    out
  }
}
