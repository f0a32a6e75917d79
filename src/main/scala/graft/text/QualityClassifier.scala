package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the classifier stage of the
  * GPT-3/CCNet/RedPajama web-curation recipe (Brown et al. 2020 §A;
  * Wenzek et al. 2019): train a cheap linear bag-of-words model to
  * separate a trusted corpus from raw crawl, then score every crawl
  * document and keep the high-scoring tail. Two classifiers, chosen
  * for exact engine portability rather than accuracy frontier:
  *
  *  - '''Multinomial Naive Bayes''' ([[nbTrain]]/[[nbScore]]): the
  *    one-pass probabilistic baseline. Per-token log-odds with
  *    Laplace smoothing; a document's score is the tf-weighted sum.
  *    Every ln() is rounded to 9 dp at the term level and the per-doc
  *    sum rides DECIMAL(18,6) (graft.Exprs.dsum) — the q114 surprisal
  *    discipline, so scores hash-match a SQL oracle exactly.
  *  - '''Batch perceptron''' ([[perceptronTrain]]/[[perceptronScore]]):
  *    the iterative margin model, kept in EXACT integer arithmetic
  *    (integer features, labels ±1, learning rate 1) so every epoch —
  *    and therefore the final weights and margins — is bit-identical
  *    across engines with no floating point at all.
  *
  * Scale shape (both classifiers):
  *  - nbTrain is one explode + one `groupBy(token)` (map-side
  *    combinable counts) + a 1-row totals aggregate cross-joined back
  *    (broadcast). No windows, no driver collect: the model STAYS a
  *    DataFrame, vocab-sized (tokens, not token instances).
  *  - nbScore re-aggregates (doc, token) tf and equi-joins the model
  *    on the token — both sides hash-partitioned by the join key, so
  *    a 10M-term vocab never needs to broadcast.
  *  - perceptron epochs each reduce to ONE map-side-combinable
  *    aggregate producing d+1 longs on the driver (the model is
  *    d+1 ints — the "codebook-sized pull" exception to the
  *    no-collect rule); the feature frame is read once per epoch, so
  *    callers persist/checkpoint it (see the q213 contract).
  */
object QualityClassifier {

  /** Per-token Laplace-smoothed log-odds model
    * `(token, c_pos, c_neg, w)` for the binary split given by
    * `positive`. `c_pos`/`c_neg` are exact token-INSTANCE counts per
    * class; `w = round(ln(((c_pos+1)/(n_pos+v)) / ((c_neg+1)/(n_neg+v))), 9)`
    * with `n_class` the class's total token instances and `v` the
    * vocabulary size — the standard multinomial NB evidence weight.
    * The class prior is deliberately NOT folded in: it is a constant
    * shift shared by every document, absorbed by whatever keep
    * threshold the curation step applies.
    */
  def nbTrain(df: DataFrame, textCol: String, positive: Column): DataFrame = {
    val tok = df.select(positive.cast("boolean").as("__pos"),
      explode(TextOps.tokens(col(textCol))).as("token"))
    // the vocab-sized count table is eagerly checkpointed (the
    // knBigramLm artifact contract): its lineage feeds both the model
    // rows and the totals here, and every nbScore reuse of the model
    // (the weight join AND its own totals) — without the pin each of
    // those is another full corpus scan.
    val counts = tok.groupBy("token").agg(
        sum(when(col("__pos"), 1L).otherwise(0L)).as("c_pos"),
        sum(when(!col("__pos"), 1L).otherwise(0L)).as("c_neg"))
      .localCheckpoint(true)
    counts.crossJoin(broadcast(nbTotals(counts)))
      .select(col("token"), col("c_pos"), col("c_neg"),
        nbWeight(col("c_pos"), col("c_neg")).as("w"))
  }

  /** The 1-row `(n_pos, n_neg, v)` totals frame of a count table —
    * recomputed from the model at scoring time so the two sides can
    * never drift (same sums, same rows).
    */
  private def nbTotals(counts: DataFrame): DataFrame =
    counts.agg(sum(col("c_pos")).as("n_pos"), sum(col("c_neg")).as("n_neg"),
      count(lit(1)).as("v"))

  /** `round(ln(((cPos+1)/(n_pos+v)) / ((cNeg+1)/(n_neg+v))), 9)` —
    * one division chain in IEEE doubles, one ln, one round, written
    * once so model weights and the out-of-vocabulary fallback
    * (`cPos = cNeg = 0`) can never use different arithmetic.
    * Requires `n_pos`/`n_neg`/`v` in scope (see [[nbTotals]]).
    */
  private def nbWeight(cPos: Column, cNeg: Column): Column =
    round(log(
      ((cPos + lit(1)).cast("double") / (col("n_pos") + col("v"))) /
        ((cNeg + lit(1)).cast("double") / (col("n_neg") + col("v")))), 9)

  /** Per-document NB evidence `(id, n_tokens, score)`:
    * `score = Σ_token tf · w(token)`, summed order-independently in
    * DECIMAL(18,6). Tokens absent from the model contribute the
    * smoothed unseen weight (the `c=0` row of the same formula) —
    * scoring a NEW crawl snapshot against a frozen model is the
    * normal production use, so OOV mass must not silently vanish.
    */
  def nbScore(df: DataFrame, idCol: String, textCol: String,
              model: DataFrame): DataFrame = {
    val tf = df
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    val withW = tf
      .join(model.select("token", "w"), Seq("token"), "left")
      .crossJoin(broadcast(nbTotals(model.select("c_pos", "c_neg"))))
      .select(col(idCol), col("tf"),
        coalesce(col("w"), nbWeight(lit(0), lit(0))).as("__w"))
    withW.groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_tokens"),
        graft.Exprs.dsum(col("tf") * col("__w")).as("score"))
  }

  /** Integer token features for the linear models:
    * `(id, f_bias=1, f_tokens, f_distinct, f_marker)` — document
    * length, lexical diversity, and the instance count of one marker
    * token (e.g. an anchor stopword), all exact longs. One projection
    * pass; the token array is held as an attribute so the lambda does
    * not re-split per element (the q72 HOF rule).
    */
  def tokenFeatures(df: DataFrame, idCol: String, textCol: String,
                    marker: String): DataFrame =
    df.select(col(idCol), TextOps.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), lit(1L).as("f_bias"),
        size(col("__toks")).cast("long").as("f_tokens"),
        size(array_distinct(col("__toks"))).cast("long").as("f_distinct"),
        size(filter(col("__toks"), t => t === lit(marker))).cast("long")
          .as("f_marker"))

  /** Batch perceptron over integer features: `epochs` rounds of
    * `w += Σ_{i misclassified} y_i · x_i` with learning rate 1,
    * starting from the zero vector. `labelCol` must be ±1. Each epoch
    * is one aggregate job; the returned model is the d-long weight
    * vector. `feats` is read `epochs` times — callers persist it.
    * All arithmetic is Long (features and running margins must stay
    * below 2^63; token-count features over real documents are ≪ 2^20,
    * leaving ~2^40 of headroom for the misclassified-sum at any
    * corpus size a single aggregate can see).
    */
  def perceptronTrain(feats: DataFrame, labelCol: String,
                      featureCols: Seq[String], epochs: Int): Array[Long] = {
    require(epochs >= 1, s"epochs must be >= 1, got $epochs")
    var w = Array.fill(featureCols.size)(0L)
    for (_ <- 1 to epochs) {
      val mis = col(labelCol) * margin(featureCols, w) <= 0
      // coalesce: an EMPTY feature frame aggregates to NULL sums, and
      // getLong on a null would throw — an empty epoch is a no-op
      val upd = featureCols.map(c =>
        coalesce(sum(when(mis, col(labelCol) * col(c)).otherwise(0L)),
          lit(0L)))
      val row = feats.agg(upd.head, upd.tail: _*).head()
      w = w.indices.map(i => w(i) + row.getLong(i)).toArray
    }
    w
  }

  private def margin(featureCols: Seq[String], w: Array[Long]): Column =
    featureCols.zip(w).map { case (c, wi) => col(c) * lit(wi) }
      .reduce(_ + _)

  /** `(input columns…, margin, pred)` for a trained weight vector:
    * `margin = w · x` (exact long), `pred = margin > 0`. */
  def perceptronScore(feats: DataFrame, featureCols: Seq[String],
                      w: Array[Long]): DataFrame =
    feats.withColumn("margin", margin(featureCols, w))
      .withColumn("pred", col("margin") > 0)

  /** Preference-pair mining — the DPO/RLHF data-prep step: within
    * each group (same prompt cluster / source / language), pair the
    * highest-scoring document (`chosen`) with the lowest (`rejected`)
    * when the score gap clears `minGap`; groups too uniform to carry
    * a preference signal emit nothing, and a single-doc group can
    * never pair with itself. Scale shape: two top-1 windows per
    * group key — rank-1 `row_number` filters compile to
    * WindowGroupLimit, so the top/bottom row is found map-side and
    * only one row per group reaches the exchange (the q214 read);
    * the final join carries one row per group on each side.
    */
  def preferencePairs(scored: DataFrame, groupCols: Seq[String],
                      idCol: String, scoreCol: String,
                      minGap: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gc = groupCols.map(col)
    val best = Window.partitionBy(gc: _*)
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    val worst = Window.partitionBy(gc: _*)
      .orderBy(col(scoreCol).asc, col(idCol).asc)
    val chosen = scored
      .withColumn("__rn", row_number().over(best)).filter(col("__rn") === 1)
      .select(gc :+ col(idCol).as("chosen_id")
        :+ col(scoreCol).as("chosen_score"): _*)
    val rejected = scored
      .withColumn("__rn", row_number().over(worst)).filter(col("__rn") === 1)
      .select(gc :+ col(idCol).as("rejected_id")
        :+ col(scoreCol).as("rejected_score"): _*)
    chosen.join(rejected, groupCols)
      .withColumn("gap", col("chosen_score") - col("rejected_score"))
      .filter(col("chosen_id") =!= col("rejected_id") &&
        col("gap") >= minGap)
  }

  /** Reliability diagram for a scored corpus: equal-count score bins
    * (exact NTILE semantics via the distributed
    * [[graft.operators.Ranks.ntile]] — never the single-task global
    * window) with per-bin count, positive count, positive rate and
    * decimal-mean score. A calibrated classifier's `pos_rate` rises
    * with the bin; a flat diagram means the score carries no signal.
    * `scored` is read by ntile's multiple passes — callers persist.
    */
  def calibrationBins(scored: DataFrame, idCol: String, scoreCol: String,
                      labelCol: String, bins: Int): DataFrame =
    graft.operators.Ranks.ntile(scored, bins, scoreCol,
        ascending = true, tiebreaks = Seq(idCol), out = "bin")
      .groupBy("bin").agg(
        count(lit(1)).as("n"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("n_pos"),
        graft.Exprs.davg(col(scoreCol)).as("mean_score"))
      .withColumn("pos_rate", col("n_pos").cast("double") / col("n"))

  /** Exact ROC AUC by the Mann–Whitney rank-sum, tie-corrected with
    * midranks — `(n_pos, n_neg, auc)` in ONE row. All arithmetic is
    * exact integers until the final division: scores collapse to a
    * distinct-score count table (the aggregate carries distinct
    * scores, never rows), the exclusive prefix sum rides
    * [[graft.operators.Ranks.prefixSum]]'s bucket scheme (no global
    * window), and TWICE the midrank of a score group —
    * `2·cum_before + n + 1` — keeps ties in integers. The rank-sum
    * accumulates in DECIMAL(38,0): at 10^10 rows the Long rank-sum
    * would overflow, the decimal never does.
    */
  def aucExact(scored: DataFrame, scoreCol: String,
               labelCol: String): DataFrame = {
    val g = scored.groupBy(col(scoreCol).as("s")).agg(
      count(lit(1)).as("n"),
      sum(when(col(labelCol), 1L).otherwise(0L)).as("np"))
    val pre = graft.operators.Ranks.prefixSum(g, "s", "n",
      ascending = true, out = "cum")
    pre.agg(
        sum((col("np") * (lit(2L) * col("cum") + col("n") + lit(1L)))
          .cast("decimal(38,0)")).as("u2"),
        sum(col("np")).as("p"),
        sum(col("n") - col("np")).as("nn"))
      .select(col("p").as("n_pos"), col("nn").as("n_neg"),
        // single-class input has no ranking to measure: NULL, not the
        // ±Infinity a bare zero division would silently emit
        when(col("p") > 0 && col("nn") > 0,
          (col("u2") - col("p") * (col("p") + lit(1L))).cast("double") /
            (lit(2L).cast("decimal(38,0)") * col("p") * col("nn"))
              .cast("double")).as("auc"))
  }
}
