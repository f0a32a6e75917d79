package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
  * SIGMOD 2003 — the MOSS algorithm): hash every token k-gram, slide a
  * window of `w` consecutive hashes, and keep each window's MINIMUM
  * (rightmost occurrence on ties, per the paper). The selected
  * (position, hash) set is a ~2/(w+1)-density sketch with the paper's
  * GUARANTEE — any shared token run of at least `w + k − 1` tokens
  * between two documents yields at least one shared fingerprint —
  * which a random sample of k-grams cannot promise. The complement to
  * the engine's other sketches: MinHash (q183) estimates WHOLE-DOC
  * resemblance, span dedup (q123) finds one fixed n-gram granularity;
  * winnowing is the boilerplate/quotation detector whose sensitivity
  * length is a tunable contract.
  *
  * Everything is per-row array HOFs over the token array — no shuffle,
  * no UDF, rides the corpus scan at any scale. The per-gram hash is
  * the engine's portable rolling hash ([[graft.functions.RollingHash]]:
  * fold `h·31 + byte mod 1e9+7`), so the whole selection replays in
  * plain SQL and the output is hash-oracled, not rows-only.
  *
  * [[overlapPairs]] is the corpus-scale consumer: equi-join docs on
  * shared fingerprint hashes (a fingerprint bucket join, the same
  * shape as every dedup family here — never all-pairs), count DISTINCT
  * shared hashes per pair, keep pairs at or above `minShared`.
  * Degenerate boilerplate hashes (shared by half the corpus) are
  * dropped by `maxBucketSize` on BOTH sides — the documented
  * [[graft.dedup.NearDup.prefixFilterPairs]] cap trade.
  */
object Winnow {

  /** One row per selected fingerprint: `(idCol, pos, fp)` — `pos` is
    * the 0-based k-gram index, `fp` the gram's rolling hash. Selection
    * per the paper: window starts 0..max(m−w, 0) (short docs with
    * 1 ≤ m < w degrade to one whole-doc window — `slice` clamps), min
    * hash per window, rightmost position on ties, distinct across
    * windows.
    *
    * Every stage (tokens → gram hashes → windows) is PROJECTED to a
    * real column before the next references it: higher-order functions
    * evaluate interpreted, and an inline subtree is RE-EVALUATED at
    * every reference — with `hs` left as a tree, each of the O(m)
    * window slices would recompute all m gram hashes, turning a linear
    * projection into O(m²·k) string work per document (the
    * [[TextOps.dupTokenFrac]] trap, measured as a >100× slowdown on
    * soak-scale docs). Window minima/reversals inside the final lambda
    * touch only w-element bound values — O(m·w) total, the paper's
    * cost.
    */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 4, w: Int = 4): DataFrame = {
    require(k >= 1, s"k-gram size must be >= 1, got $k")
    require(w >= 1, s"window size must be >= 1, got $w")
    val picks = transform(col("__wins"), (win, i) => {
      val mn = array_min(win)
      // rightmost tie: 1-based position of mn in the REVERSED window
      val posInWin = size(win) - array_position(reverse(win), mn)
        .cast("int")
      struct((i + posInWin).cast("int").as("pos"), mn.as("fp"))
    })
    df.select(col(idCol), TextOps.tokens(col(textCol)).as("__toks"))
      .select(col(idCol),
        transform(TextOps.ngrams(col("__toks"), k),
          g => graft.functions.RollingHash.of(g)).as("__hs"))
      .select(col(idCol),
        when(size(col("__hs")) >= 1,
          transform(
            sequence(lit(0), greatest(size(col("__hs")) - w, lit(0))),
            i => slice(col("__hs"), i + 1, lit(w))))
          .otherwise(array().cast("array<array<bigint>>")).as("__wins"))
      .select(col(idCol), explode(array_distinct(picks)).as("__s"))
      .select(col(idCol), col("__s.pos").as("pos"), col("__s.fp").as("fp"))
  }

  /** Document pairs sharing at least `minShared` DISTINCT winnowing
    * fingerprints — the MOSS match report. Fingerprint buckets larger
    * than `maxBucketSize` (corpus-wide boilerplate) are excluded from
    * both sides; pairs they alone witness are lost, exactly like the
    * near-dup caps. Output `(id1, id2, shared)`, id1 < id2.
    */
  def overlapPairs(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 4, w: Int = 4, minShared: Int = 2,
                   maxBucketSize: Int = 100000): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    require(maxBucketSize > 1, s"maxBucketSize must be > 1, got $maxBucketSize")
    val fp = fingerprints(df, idCol, textCol, k, w)
      .select(col(idCol), col("fp")).distinct()
    val capped = graft.dedup.NearDup.capBuckets(fp, Seq("fp"), maxBucketSize)
    capped.select(col("fp"), col(idCol).as("__a"))
      .join(capped.select(col("fp"), col(idCol).as("__b"))
        .hint("shuffle_hash"), Seq("fp"))
      .filter(col("__a") < col("__b"))
      .groupBy(col("__a").as("id1"), col("__b").as("id2"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }
}
