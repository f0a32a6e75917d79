package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence-packing plan: assign every document a position in a stream
  * of fixed-size context windows — the "concatenate and chunk" layout an
  * LLM training pipeline materializes before tokenized shards are
  * written. This computes the PLAN (which pack, at what token offset),
  * which is the distributed-hard part; emitting the packed token shards
  * is then an embarrassingly-parallel per-pack write.
  *
  * Scale shape: documents are hash-sharded first (`Sample.hashMod`, the
  * engine-portable id hash), so the running token sum — the only
  * sequential dependency — is per-shard, never global. ONE shuffle on
  * the shard key; within a shard the window orders by id, so the result
  * is fully deterministic on any cluster size (no RNG, no
  * partition-index dependence). Shards are hash-balanced, and shard
  * count is the caller's parallelism knob: at 100 TB you'd use
  * O(cluster cores) shards, each packing independently.
  */
object Pack {

  /** Plan columns: shard, n_tokens, pack_seq (per-shard window index,
    * by the doc's FIRST token), pack_offset (token offset of the doc
    * inside that window). Docs longer than `ctxTokens` simply span
    * packs, as concat-and-chunk does.
    */
  def packPlan(df: DataFrame, idCol: String, tokenCount: Column,
               nShards: Int, ctxTokens: Int): DataFrame = {
    val shard = Sample.hashMod(col(idCol), nShards.toLong)
    val w = Window.partitionBy("shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, 0)
    val start = sum(col("n_tokens")).over(w) - col("n_tokens")
    df.select(col(idCol), shard.as("shard"), tokenCount.as("n_tokens"))
      .withColumn("pack_seq", floor(start / ctxTokens))
      .withColumn("pack_offset", start % ctxTokens)
  }

  /** Length-bucketed inference batching: group documents of similar
    * token length and number them off into fixed-size batches, so each
    * batch pads to its own bucket's ceiling instead of the corpus
    * maximum — the standard padding-waste reduction for batched
    * inference/scoring runs.
    *
    * Output adds `n_tokens`, `len_bucket` (floor(n/bucketTokens)),
    * `shard`, and `batch_idx` (0-based batch number within the
    * (bucket, shard) group, `batchSize` docs per batch, id order).
    *
    * Scale shape: ONE shuffle on (len_bucket, shard). Length buckets
    * are wildly skewed in a real corpus (most docs are short), so the
    * window key includes the same hash shard as [[packPlan]] — no
    * single bucket ever funnels through one reducer; `nShards` is the
    * parallelism knob and `nShards = 1` gives globally consecutive
    * batch numbers when determinism across the whole bucket matters
    * more than balance.
    */
  def lengthBucketBatches(df: DataFrame, idCol: String, tokenCount: Column,
                          bucketTokens: Int, batchSize: Int,
                          nShards: Int = 1): DataFrame = {
    require(bucketTokens >= 1 && batchSize >= 1 && nShards >= 1,
      s"bucketTokens/batchSize/nShards must be >= 1")
    val w = Window.partitionBy("len_bucket", "shard").orderBy(idCol)
    df.select(col(idCol), tokenCount.as("n_tokens"),
        Sample.hashMod(col(idCol), nShards.toLong).as("shard"))
      .withColumn("len_bucket", floor(col("n_tokens") / bucketTokens).cast("long"))
      .withColumn("batch_idx",
        floor((row_number().over(w) - lit(1)) / batchSize).cast("long"))
  }

  /** GLOBAL-order concat-and-split: [[packPlan]]'s layout without the
    * shard compromise — ONE corpus-wide token stream split every
    * `seqLen` tokens, so sequence ids are globally meaningful (resume
    * points, curriculum positions, exact epoch boundaries) instead of
    * per-shard. What makes that affordable at scale is
    * [[Ranks.prefixSum]]: the exclusive running token sum — packing's
    * only sequential dependency — computed by the bucket scheme, never
    * a single-task global window.
    *
    * Semantics (exactly SQL-replayable): rows ordered by (`orderCol`
    * asc, `idCol` asc); `pre` = exclusive prefix sum of `tokensCol`;
    *   - `seq_id        = pre div seqLen`   (the sequence it starts in)
    *   - `offset_in_seq = pre mod seqLen`
    *   - `spans         = (pre + tokens - 1) div seqLen - seq_id + 1`.
    * Rows with `tokensCol <= 0` are excluded — nothing to pack. The
    * arithmetic is `div`/`pmod` on LONGs: corpus token totals pass
    * 2^53, where a double-division floor silently misplaces sequence
    * boundaries.
    */
  def concatSplit(df: DataFrame, idCol: String, tokensCol: String,
                  seqLen: Long, orderCol: Option[String] = None)
      : DataFrame = {
    require(seqLen > 0, s"seqLen must be > 0, got $seqLen")
    val oc = orderCol.getOrElse(idCol)
    val ties = if (oc == idCol) Seq.empty[String] else Seq(idCol)
    val pre = Ranks.prefixSum(
      df.filter(col(tokensCol).cast("long") > 0),
      oc, tokensCol, ascending = true, tiebreaks = ties, out = "__pre")
    pre.withColumn("seq_id", expr(s"__pre div $seqLen"))
      .withColumn("offset_in_seq", pmod(col("__pre"), lit(seqLen)))
      .withColumn("spans",
        expr(s"(__pre + `$tokensCol` - 1) div $seqLen")
          - col("seq_id") + lit(1L))
      .drop("__pre")
  }

  /** Epoch-shuffled [[concatSplit]]: the pretraining layout for one
    * training epoch in a single declarative plan — documents take the
    * deterministic epoch-`epoch` order ([[Sample.epochOrder]]'s
    * multiplier-seeded portable hash of the id, id tiebreak) and the
    * concatenated token stream splits every `seqLen` tokens. Same
    * output contract as [[concatSplit]]; each epoch yields a different
    * but fully reproducible packing (pure function of (id, epoch) and
    * the token counts — any cluster size, any file layout, any rerun,
    * and resumable mid-epoch from `seq_id`). The shuffle key is the
    * RAW hash, not a materialized row number: ordering by the key
    * directly saves [[Ranks.rowNumber]]'s three input passes — the
    * prefix sum only needs the ORDER, not the position.
    */
  def epochPack(df: DataFrame, idCol: String, tokensCol: String,
                seqLen: Long, epoch: Long): DataFrame =
    concatSplit(
      df.withColumn("__ek",
        Sample.hashMod2(col(idCol), 1000000000L, epoch)),
      idCol, tokensCol, seqLen, orderCol = Some("__ek"))
      .drop("__ek")

  /** Per-sequence roll-up of [[concatSplit]]: how many documents START
    * in each sequence, the tokens they carry in, and how many cross
    * its right boundary — the packing-quality report a pipeline checks
    * before committing a corpus layout. Pure groupBy over the
    * assignment, no additional order dependence.
    */
  def packStats(assigned: DataFrame, tokensCol: String): DataFrame =
    assigned.groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokensCol).cast("long")).as("tokens_started"),
        sum(when(col("spans") > 1, 1L).otherwise(0L)).as("boundary_docs"))
}
