package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Near-duplicate detection at corpus scale: MinHash + LSH banding,
  * SimHash with blocked Hamming search, and exact n-gram Jaccard
  * verification. The non-negotiable design rule at 100 TB: NEVER form
  * all pairs. Both families reduce candidate generation to an equi-join
  * on a bucket key (band hash / simhash block), so candidates scale with
  * collisions, not with N².
  */
object NearDup {

  import graft.functions.MinHashSignature

  /** MinHash signatures over token `n`-gram shingles: one row per doc,
    * `sig` = array of k minima. Single projection pass per row —
    * nothing shuffles except the parallelism repartition.
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 64, shingleN: Int = 3): DataFrame =
    // Repartition first: a small input (one file = one partition) would
    // otherwise compute every signature on a single thread. The
    // signature itself is the native codegen'd MinHashSignature
    // expression over the TOKEN array — shingles combine as rolling
    // token hashes, never as strings; no explode, no aggregation
    // shuffle (see graft.functions.MinHashSignature).
    df.repartition(col(idCol))
      .select(col(idCol),
        MinHashSignature.signature(TextOps.tokens(col(textCol)), k, shingleN)
          .as("sig"))

  /** LSH banding: split the k-wide signature into `bands` bands of
    * `rowsPerBand` and emit (band_id, band_hash) bucket keys. Docs
    * sharing any bucket become candidates via a self-equi-join on the
    * bucket key — one shuffle, no cross product.
    */
  def lshBuckets(sigs: DataFrame, idCol: String, bands: Int, rowsPerBand: Int): DataFrame =
    sigs.select(
        col(idCol),
        posexplode(
          transform(sequence(lit(0), lit(bands - 1)),
            b => xxhash64(concat_ws(",",
              transform(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)),
                x => x.cast("string")))))))
      .withColumnRenamed("pos", "band_id")
      .withColumnRenamed("col", "band_hash")

  /** Candidate pairs (id1 < id2) from shared LSH buckets. */
  def candidatePairs(buckets: DataFrame, idCol: String): DataFrame = {
    val a = buckets.select(col("band_id"), col("band_hash"), col(idCol).as("id1"))
    val b = buckets.select(col("band_id"), col("band_hash"), col(idCol).as("id2"))
    a.join(b, Seq("band_id", "band_hash"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
  }

  /** Exact token-set Jaccard for candidate pairs — the verify step after
    * LSH narrowed the space. Joins the (distinct-token-set) docs to the
    * pair list twice; candidate cardinality ≪ N², so both joins are
    * cheap and broadcast-able when pairs are few.
    */
  def jaccardVerify(pairs: DataFrame, df: DataFrame, idCol: String,
                    textCol: String): DataFrame = {
    val toks = df.repartition(col(idCol)).select(col(idCol),
      array_distinct(TextOps.tokens(col(textCol))).as("toks"))
    pairs
      .join(toks.select(col(idCol).as("id1"), col("toks").as("t1")), Seq("id1"))
      .join(toks.select(col(idCol).as("id2"), col("toks").as("t2")), Seq("id2"))
      .select(col("id1"), col("id2"),
        (size(array_intersect(col("t1"), col("t2"))).cast("double") /
          size(array_union(col("t1"), col("t2")))).as("jaccard"))
  }

  /** End-to-end MinHash-LSH near-dup pairs above `threshold`. The
    * signature table is persisted for the duration of the plan: the
    * bucket self-join references it twice, and without the persist the
    * whole signature computation would run once per side.
    */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String,
                   threshold: Double = 0.8, k: Int = 64, bands: Int = 16,
                   shingleN: Int = 3): DataFrame = {
    val sigs = minhashSignatures(df, idCol, textCol, k, shingleN)
    val buckets = lshBuckets(sigs, idCol, bands, k / bands)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = candidatePairs(buckets, idCol)
    jaccardVerify(pairs, df, idCol, textCol).filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash over tokens: per-bit vote of token-hash sign bits,
    * computed by the native codegen'd [[graft.functions.SimHash64]]
    * expression — a pure projection, NO shuffle (the earlier explode +
    * 64-aggregate formulation shuffled every token). Repartition only
    * for parallelism on few-file inputs.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.repartition(col(idCol))
      .select(col(idCol),
        graft.functions.SimHash64.simhash(TextOps.tokens(col(textCol)))
          .as("simhash"))

  /** Near-dup pairs by SimHash Hamming distance ≤ `maxHamming`, using
    * the pigeonhole block trick: split 64 bits into `blocks` chunks; any
    * pair within distance `blocks-1` must agree exactly on ≥1 chunk, so
    * candidates come from an equi-join on (block_id, block_value).
    */
  def simhashPairs(sigs: DataFrame, idCol: String, maxHamming: Int = 3,
                   blocks: Int = 4): DataFrame = {
    val width = 64 / blocks
    val mask = (1L << width) - 1L
    // Persisted: the candidate self-join reads this twice; without the
    // persist the full simhash aggregation upstream would run per side.
    val keyed = sigs.select(col(idCol), col("simhash"),
      posexplode(expr(
        s"transform(sequence(0, ${blocks - 1}), b -> shiftright(simhash, b * $width) & ${mask}L)")))
      .withColumnRenamed("pos", "block_id")
      .withColumnRenamed("col", "block_val")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = keyed.select(col("block_id"), col("block_val"),
      col(idCol).as("id1"), col("simhash").as("s1"))
    val b = keyed.select(col("block_id"), col("block_val"),
      col(idCol).as("id2"), col("simhash").as("s2"))
    a.join(b, Seq("block_id", "block_val"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        expr("bit_count(s1 ^ s2)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
