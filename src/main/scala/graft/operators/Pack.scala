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
}
