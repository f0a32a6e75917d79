package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gopher/Dolma-style document quality heuristics — the rule family
  * (Rae et al. 2021 §A1.1.2, carried into MassiveText/Dolma/RefinedWeb
  * cleaning recipes) a pre-training pipeline runs before any
  * model-based filter: cheap structural signals (token count, mean
  * word length, alphabetic-word fraction, stopword evidence) and
  * repetition signals (most-frequent-bigram share, duplicated-trigram
  * share) that catch boilerplate, keyword stuffing, and
  * template-generated text.
  *
  * Determinism discipline: every emitted ratio is an exact integer
  * PPM (`count · 1,000,000 div total` — the funnel/gains-table house
  * recipe), never a float quotient, so the outputs hash-compare
  * across engines with no rounding protocol at all.
  *
  * Scale shape: [[gopherSignals]] is ONE codegen'd projection pass
  * (HOFs over the token array — no shuffle, no UDF);
  * [[repetitionSignals]] explodes per-document n-grams and
  * aggregates on (doc, gram) keys — two map-side-combinable shuffles,
  * no windows, no collects; both scale as plain data-parallel passes
  * over a trillion documents.
  */
object GopherRules {

  /** Per-document structural quality signals plus the composite
    * `keep` verdict. All thresholds are exact-integer PPM bounds.
    *
    * Signals: `n_tokens`; `mean_word_len_ppm` (total token chars ·1e6
    * div tokens); `alpha_word_ppm` (tokens containing a letter ·1e6
    * div tokens); `stop_hits` (token instances found in `stopwords` —
    * Gopher's "at least 2 stop words" fluency evidence).
    *
    * `n_tokens` ≥ 1 always holds (splitting even an empty string
    * yields one element), so the ppm divisions can never hit zero.
    */
  def gopherSignals(docs: DataFrame, idCol: String, textCol: String,
                    stopwords: Seq[String],
                    minTokens: Long = 50, maxTokens: Long = 100000,
                    minMeanWordLenPpm: Long = 3000000L,
                    maxMeanWordLenPpm: Long = 10000000L,
                    minAlphaWordPpm: Long = 800000L,
                    minStopHits: Long = 2L): DataFrame =
    docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("__toks"))
      .select(col(idCol),
        size(col("__toks")).cast("long").as("n_tokens"),
        aggregate(transform(col("__toks"), t => length(t).cast("long")),
          lit(0L), (a, x) => a + x).as("__chars"),
        size(filter(col("__toks"), t => t.rlike("[A-Za-z]")))
          .cast("long").as("__alpha"),
        TextOps.hitCountToks(col("__toks"), stopwords).as("stop_hits"))
      .select(col(idCol), col("n_tokens"),
        expr("__chars * 1000000L div n_tokens").as("mean_word_len_ppm"),
        expr("__alpha * 1000000L div n_tokens").as("alpha_word_ppm"),
        col("stop_hits"))
      .withColumn("keep",
        col("n_tokens").between(minTokens, maxTokens) &&
          col("mean_word_len_ppm")
            .between(minMeanWordLenPpm, maxMeanWordLenPpm) &&
          col("alpha_word_ppm") >= minAlphaWordPpm &&
          col("stop_hits") >= minStopHits)

  /** Per-document repetition signals plus the composite `keep`:
    * `top_bigram_ppm` (share of bigram instances belonging to the
    * single most frequent bigram) and `dup_trigram_ppm` (share of
    * trigram instances whose trigram occurs more than once) — the
    * Gopher "repetition" rule pair at n=2/n=3, which between them
    * catch both a single stuck phrase and diffuse copy-paste.
    *
    * Documents with fewer than 3 tokens have no trigram and are
    * dropped (they are below any plausible `minTokens` gate anyway —
    * compose with [[gopherSignals]] for the length verdict).
    *
    * Default thresholds follow the published rule of thumb (most
    * frequent 2-gram ≤ 20% of the text, duplicated 3-grams ≤ 30%).
    */
  def repetitionSignals(docs: DataFrame, idCol: String, textCol: String,
                        maxTopBigramPpm: Long = 200000L,
                        maxDupTrigramPpm: Long = 300000L): DataFrame = {
    val toks = docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("__t"))
      .filter(size(col("__t")) >= 3)
    def grams(n: Int) = toks.select(col(idCol),
      explode(transform(
        sequence(lit(0), size(col("__t")) - n),
        i => concat_ws(" ",
          (1 to n).map(k => element_at(col("__t"), i + k)): _*))).as("g"))
    val bt = grams(2).groupBy(col(idCol), col("g"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(max(col("c")).as("__mx"), sum(col("c")).as("__btot"))
    val tt = grams(3).groupBy(col(idCol), col("g"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(sum(when(col("c") > 1, col("c")).otherwise(lit(0L)))
        .as("__dup"), sum(col("c")).as("__ttot"))
    // n_tokens = bigram instances + 1 (every kept doc has >= 3
    // tokens), so the token count rides the bigram aggregate for
    // free — no third tokenize pass over the corpus and no extra
    // join leg; the two n-gram passes are the only corpus scans.
    bt.join(tt, Seq(idCol))
      .select(col(idCol), (col("__btot") + 1L).as("n_tokens"),
        expr("__mx * 1000000L div __btot").as("top_bigram_ppm"),
        expr("__dup * 1000000L div __ttot").as("dup_trigram_ppm"))
      .withColumn("keep",
        col("top_bigram_ppm") <= maxTopBigramPpm &&
          col("dup_trigram_ppm") <= maxDupTrigramPpm)
  }
}
