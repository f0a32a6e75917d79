package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact-replayable Bloom-filter join prefilter — the shuffle killer
  * for SELECTIVE joins at 100 TB: when a fact table joins a small key
  * set (an audited customer segment, a recall list, a blocklist), the
  * classic plans either broadcast the whole key set into the join or
  * shuffle the facts; a Bloom prefilter instead reduces the fact side
  * with a PURE PROJECTION — a bit-array membership test compiled into
  * the scan, no exchange — and only the survivors (true matches plus
  * the bounded false-positive mass) ever reach the real join. This is
  * the manual, engine-portable form of the runtime bloom pruning AQE
  * sometimes injects: the filter is explicit, sized by the caller,
  * and every bit position derives from [[Sample.hashMod2]] — plain
  * integer arithmetic any engine (and the DuckDB oracle) replays
  * bit-for-bit, so the CANDIDATE SET itself is testable, not just the
  * final join result.
  *
  * The filter state is driver-collected — BOUNDED by construction at
  * `m` bits regardless of key count (the same bounded-collect
  * discipline as [[Ranks]]' cut points) — and inlined as a literal
  * array, so the probe side ships no join state at all. Ids must be
  * nonnegative (the [[Sample]] id contract). False positives are the
  * documented trade (size `m` vs key count: FP rate ≈ (1−e^(−kn/m))^k);
  * false negatives are impossible — the prefilter never drops a true
  * match, so `prefilter → exact join` is semantically identical to
  * the exact join alone.
  */
object BloomJoin {

  /** Build the `m`-bit filter over `keys`: each key sets the `k` bits
    * at positions `hashMod2(id, m, seed + i)`, i < k (per-probe seeds
    * — independent positions from one portable hash family, the
    * composed-sampler rule). One map-side-combinable aggregate with at
    * most `m` groups, one bounded collect.
    */
  def build(keys: DataFrame, key: Column, m: Int = 1024,
            k: Int = 3, seed: Long = 0L): Array[Boolean] = {
    require(m >= 64 && m <= (1 << 24), s"m must be in [64, 2^24], got $m")
    require(k >= 1 && k <= 16, s"k must be in [1, 16], got $k")
    val probes = array((0 until k).map(i =>
      Sample.hashMod2(key, m.toLong, seed + i)): _*)
    val set = keys.select(explode(probes).as("__p"))
      .groupBy(col("__p")).agg(count(lit(1)).as("__n"))
      .select(col("__p")).collect().map(_.getLong(0).toInt)
    val bits = new Array[Boolean](m)
    set.foreach(bits(_) = true)
    bits
  }

  /** The membership predicate: true iff ALL `k` probe positions of
    * `key` are set. A pure projection over a literal array — attach
    * with `.filter`; nothing shuffles, nothing broadcasts.
    */
  def mightContain(key: Column, bits: Array[Boolean], k: Int = 3,
                   seed: Long = 0L): Column = {
    val m = bits.length.toLong
    val arr = typedlit(bits.toSeq)
    (0 until k).map { i =>
      element_at(arr, Sample.hashMod2(key, m, seed + i).cast("int") + 1)
    }.reduce(_ && _)
  }
}
