package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-prefiltered EXACT aggregation — the pattern that turns an
  * approximate sketch into an exact answer at sketch cost.
  *
  * The naive exact heavy-hitter query (`GROUP BY key HAVING count >=
  * t`) shuffles every distinct key: at 100 TB of tokens that exchange
  * carries the full vocabulary — billions of near-unique keys — to
  * find the handful of heavy ones. A Count-Min sketch inverts the
  * cost: fixed size (depth × width counters, independent of N),
  * mergeable map-side, and one-sided — it can only OVERestimate a
  * count, never underestimate. So `estimate >= t` keeps every truly
  * heavy key (no false negatives, only false-positive candidates),
  * and an exact count of just the candidate rows both prunes the
  * false positives and replaces the estimates with true counts. The
  * output is therefore EXACTLY the naive query's — oracle-checkable
  * against plain SQL, unlike a raw sketch readout — while only rows
  * whose key passes the probe ever shuffle.
  */
object Sketches {

  /** Exact `(key, n)` rows for every non-null key occurring at least
    * `minCount` times, computed as CMS-prefilter + exact rescore.
    * EAGER: the sketch (fixed-size; ~1.1 MB at the defaults) is
    * materialized on the driver here and handed to the probe as an
    * expression constructor FIELD — the same shape as
    * [[graft.text.CorpusClean.decontaminateBloom]], and for the same
    * measured reasons: as a field it hashes by identity instead of the
    * O(length)-per-tree-hash a multi-MB `Literal` node costs every
    * analyzer/AQE rule, and the probe caches one deserialized sketch
    * per JVM (see [[graft.functions.CmsProbe]]).
    *
    * The pattern is inherently TWO passes over `df` — one to build the
    * sketch, one to probe + rescore — so with `persistInput = true`
    * (default) the input is persisted across them and the (tiny) heavy
    * key set eagerly checkpointed so the cache can be dropped before
    * returning: a derived input (tokenize → ngram → explode, q122's
    * shape) is computed ONCE, not once per pass — at 100 TB the
    * redundant tokenize pass is real money. Pass `persistInput =
    * false` when `df` is a bare columnar scan that is cheaper to
    * re-scan than to cache, which also keeps the result lazy. NOTE:
    * `persistInput = true` makes this call EAGER (the sketch build and
    * the checkpoint both run inside the call) — callers composing lazy
    * pipelines should pass `false`. If the caller ALREADY persisted
    * `df`, this call leaves that cache alone (no re-persist, no
    * unpersist): it only frees a cache entry it created itself.
    *
    * Key column must be bigint or string (the types the probe and
    * Spark's `count_min_sketch` aggregate hash identically). Null keys
    * are excluded, matching `GROUP BY ... HAVING` twins that filter
    * nulls.
    *
    * `eps` bounds the overestimate: with probability `confidence`,
    * estimate <= true + eps·TOTAL rows. False positives start costing
    * shuffle volume when eps·total approaches minCount, so for very
    * low thresholds over very large corpora, shrink eps (sketch width
    * grows as 2/eps — still independent of the corpus).
    */
  def heavyHitters(df: DataFrame, keyCol: String, minCount: Long,
                   eps: Double = 1e-4, confidence: Double = 0.99,
                   seed: Int = 42, persistInput: Boolean = true): DataFrame = {
    require(minCount > 0, s"minCount must be positive, got $minCount")
    val key = col(keyCol)
    // Persist only if the caller hasn't: re-persisting an already-cached
    // Dataset is a no-op in Spark (warn + keep existing level), so an
    // unconditional unpersist below would silently drop the CALLER's
    // cache entry. Track whether this call owns the persist.
    val ownsPersist = persistInput && df.storageLevel ==
      org.apache.spark.storage.StorageLevel.NONE
    val in =
      if (ownsPersist)
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else df
    val sketch: Array[Byte] = in
      .agg(call_function("count_min_sketch",
        key, lit(eps), lit(confidence), lit(seed)).as("__graft_cms"))
      .head.getAs[Array[Byte]](0)
    val out = in.filter(key.isNotNull &&
        graft.functions.CmsProbe.of(sketch, key) >= minCount)
      .groupBy(key).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
    if (ownsPersist) {
      // Materialize off the cache, then free it (nearDupPairs pattern:
      // eager result, truncated lineage, blocks live until GC). Only
      // runs when WE created the cache — a caller-owned cache is left
      // for the caller to manage.
      val ckpt = out.localCheckpoint(true)
      in.unpersist()
      ckpt
    } else out
  }
}
