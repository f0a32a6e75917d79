package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** The C4-style corpus cleaning composite: score every document
  * (tokens, stopword density, language), keep the ones a training run
  * would want, then drop exact duplicates keeping the lowest id. This
  * is the operator a 100 TB pre-training pipeline runs first, built
  * entirely from the oracled primitives in [[TextOps]] and
  * [[graft.operators.Dedup]].
  *
  * Scale shape: scoring is one codegen'd projection pass (no shuffle);
  * the filter runs before the dedup so only surviving docs shuffle; the
  * dedup is one `WindowGroupLimit` pass over the NARROW projection
  * (id, digest, scores) — partial top-1 per digest map-side, text never
  * shuffles, nothing evaluates twice.
  */
object CorpusClean {

  /** Documents that pass the language / fluency / length gates, exact
    * duplicates removed (min id per identical text wins). Output keeps
    * the score columns so downstream sampling can stratify on them.
    */
  def cleanCorpus(docs: DataFrame, idCol: String, textCol: String,
                  lang: String, stopwords: Seq[String],
                  minStopRatio: Double, minTokens: Long,
                  maxTokens: Long): DataFrame = {
    // Tokenize ONCE: the token attribute is referenced by every score
    // below (7 consumers), so CollapseProject keeps the projection and
    // the regex split runs once per row instead of once per signal.
    val scored = docs
      .select(col(idCol), col(textCol), TextOps.tokens(col(textCol)).as("__toks"))
      .select(
        Seq(col(idCol), col(textCol),
          size(col("__toks")).cast("long").as("n_tokens"),
          TextOps.wordRatioToks(col("__toks"), stopwords).as("stop_ratio")) ++
          TextOps.langScoresToks(col("__toks")): _*)
      .withColumn("predicted_lang", TextOps.langIdFromScores)
    val kept = scored.filter(
      col("predicted_lang") === lang &&
        col("stop_ratio") >= minStopRatio &&
        col("n_tokens").between(minTokens, maxTokens))
    Dedup.exactDedupWindowed(
      kept.select(col(idCol), col(textCol), col("n_tokens"), col("stop_ratio")),
      idCol, Seq(textCol))
      .select(col(idCol), col("n_tokens"), col("stop_ratio"))
  }

  /** Perplexity filtering (the CCNet/Wenzek-style fluency gate): score
    * every document by MEAN unigram surprisal under the corpus's own
    * distribution, rank into deciles, and flag the worst (most
    * surprising ≈ least fluent) ones. Model-free stand-in for an LM
    * perplexity filter with the same selection semantics.
    *
    * Determinism: the mean is one IEEE division of the decimal-exact
    * surprisal total by the integer token count — bit-identical
    * operands give bit-identical quotients, so ORDERING by it is safe
    * even though emitting a rounded quotient would not be (the q150
    * round-tie lesson: round-ties drift, comparisons don't). Deciles
    * are exact integer rank arithmetic (`(rank-1)·10 div n`), id
    * tiebreaks, with the rank produced by the distributed
    * [[graft.operators.Ranks.rowNumber]] — one row per document, never
    * a no-partition window, so the decile pass hash-distributes even
    * on a trillion-doc corpus. Ranks reads its input three times, so
    * the per-document score table (a tokenize+join+agg chain) is
    * eagerly checkpointed first (the operator's caller contract).
    */
  def surprisalDecileFilter(docs: DataFrame, idCol: String,
                            textCol: String,
                            dropWorstDeciles: Int = 1): DataFrame = {
    val per = Vocab.unigramSurprisal(docs, idCol, textCol)
      .withColumn("mean_surprisal",
        col("total_surprisal") / col("n_tokens"))
      .localCheckpoint(true)
    val ranked = graft.operators.Ranks
      .rowNumber(per, "mean_surprisal", ascending = true,
        tiebreaks = Seq(idCol), out = "__rn")
      .crossJoin(broadcast(per.agg(count(lit(1)).as("__n"))))
      .withColumn("decile", lit(1L) + expr("10L * (__rn - 1) div __n"))
    ranked.select(col(idCol), col("n_tokens"), col("total_surprisal"),
      col("mean_surprisal"), col("decile"),
      (col("decile") <= lit(10L - dropWorstDeciles)).as("keep"))
  }

  /** Benchmark decontamination: drop training documents whose content
    * fingerprint appears in the eval set. The anti join runs on the
    * rolling-hash fingerprint ([[TextOps.fingerprint]], oracled in
    * q44), so the build side is one long per eval doc — an eval suite
    * is thousands of rows against billions of training docs, so the
    * fingerprint set broadcasts and the training corpus never shuffles.
    */
  def decontaminate(train: DataFrame, evalSet: DataFrame,
                    textCol: String): DataFrame = {
    val fp = "__graft_fp"
    val evalFps = evalSet
      .select(TextOps.fingerprint(col(textCol)).as(fp)).distinct()
    train.withColumn(fp, TextOps.fingerprint(col(textCol)))
      .join(evalFps, Seq(fp), "left_anti")
      .drop(fp)
  }

  /** [[decontaminate]] with a Bloom-filter prefilter — same output, a
    * different 100 TB cost profile. The anti join ships the full eval
    * fingerprint SET to every task while it broadcasts, and once the
    * eval suite outgrows the broadcast threshold it re-SHUFFLES the
    * ENTIRE training corpus. Here every training row first probes a
    * Bloom sketch (a few bits per eval doc, built in one
    * `graft_bloom_agg` aggregate): probe-negative rows — the
    * overwhelming majority — are kept with NO join and NO shuffle at
    * all, and only the sketch's false-positive candidates go through
    * the exact anti join. The result is EXACTLY the anti-join result
    * (the exact pass removes false positives), verified against the
    * same oracle as [[decontaminate]].
    *
    * EAGER: the sketch (≤ 8 MB under the clamp below) is materialized
    * on the driver here and handed to the probe as an expression
    * constructor FIELD ([[graft.functions.BloomProbe]] doc has the
    * mechanism — NOT a `Literal` node, whose O(length) hashCode/equals
    * every tree-hashing rule would rescan), so calling this runs the
    * eval-side aggregate immediately. The driver-constant shape
    * matters for speed, not just plan hygiene: the alternative — a
    * one-row-sketch broadcast JOIN — hands the probe a fresh
    * byte-array copy per row (UnsafeRow.getBinary), so the probe's
    * cache could only re-validate by content — O(sketch bytes) PER
    * ROW, measured 596 s for a 2.5 MB sketch × 2 M rows where the
    * constant-sketch path takes the probe to reference-equality O(1)
    * (see BENCH in COVERAGE.md). Spark's own runtime-filter rewrite
    * makes the same choice: `might_contain` demands a foldable sketch.
    *
    * The probe is [[graft.functions.BloomProbe]]; its false-on-null
    * contract keeps the edges aligned with [[decontaminate]]: an EMPTY
    * eval set aggregates to a NULL sketch and a null-text train row has
    * a null fingerprint — both probe `false` and fall to the keep path,
    * exactly like an anti join with no match.
    */
  def decontaminateBloom(train: DataFrame, evalSet: DataFrame,
                         textCol: String,
                         expectedEvalDocs: Long = 1000000L): DataFrame = {
    val fp = "__graft_fp"
    val evalFps = evalSet
      .select(TextOps.fingerprint(col(textCol)).as(fp)).distinct()
    // 8 bits/doc ≈ 2% false-positive rate. Clamped to the session's
    // BloomFilterAggregate cap (default 64M bits): past ~8.4M eval docs
    // the sketch stops growing and the false-positive rate rises, which
    // only sends more rows through the exact anti join — the result
    // stays exact, the prefilter just gets gradually less selective.
    val maxBits = train.sparkSession.conf
      .getOption("spark.sql.optimizer.runtime.bloomFilter.maxNumBits")
      .map(_.toLong).getOrElse(67108864L)
    val numBits = math.min(
      if (expectedEvalDocs > Long.MaxValue / 8) Long.MaxValue
      else expectedEvalDocs * 8, maxBits)
    val sketch: Array[Byte] = evalFps.agg(
        graft.functions.BloomProbe.agg(col(fp), expectedEvalDocs,
          numBits).as("__graft_bf"))
      .head.getAs[Array[Byte]](0) // one row, ≤ 8 MB; null when eval empty
    val probed = train
      .withColumn(fp, TextOps.fingerprint(col(textCol)))
      .withColumn("__graft_maybe",
        graft.functions.BloomProbe.of(sketch, col(fp)))
    val clean = probed.filter(!col("__graft_maybe"))
    val survivors = probed.filter(col("__graft_maybe"))
      .join(evalFps, Seq(fp), "left_anti")
    clean.unionByName(survivors).drop("__graft_maybe", fp)
  }

  /** Contamination REPORT (the GPT-3-appendix companion to the drop
    * operators above): per training document, what fraction of its
    * distinct token n-gram shingles also occur anywhere in the eval
    * set — `overlap_ppm` in exact integer ppm, so curators can grade
    * partial contamination instead of the binary keep/drop verdict.
    * Documents with fewer than `n` tokens carry no shingle evidence
    * and are absent from the report (callers gate those on length
    * rules, not overlap).
    *
    * Shape: both sides explode to distinct shingles, ONE equi-join on
    * the shingle key (the eval side collapsed to its distinct shingle
    * set — never a doc×doc product), one doc-keyed count rollup.
    */
  def overlapReport(train: DataFrame, evalDf: DataFrame, idCol: String,
                    textCol: String, n: Int = 3): DataFrame = {
    def sh(df: DataFrame) = {
      val toks = TextOps.tokens(col(textCol))
      // scan-parallelism floor (Par.fan): tokenize + shingle explode
      // otherwise run at the scan's task count — one core for a small
      // single-file input. No-op at scale.
      graft.operators.Par.fan(df, col(idCol)).filter(size(toks) >= n)
        .select(col(idCol),
          explode(array_distinct(TextOps.shingles(toks, n))).as("__sh"))
    }
    val evalSh = sh(evalDf).select(col("__sh")).distinct()
      .withColumn("__hit", lit(1L))
    sh(train).join(evalSh, Seq("__sh"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_matched"))
      .withColumn("overlap_ppm",
        expr("n_matched * 1000000L div n_shingles"))
  }
}
