package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Scan-parallelism floor — the shared form of the rule NearDup has
  * carried since its MinHash pass was found running one-threaded: a
  * small input that arrives as one file (= one parquet row group = one
  * scan task) executes ALL of its narrow per-row work — tokenize,
  * explode, decode, expression-heavy projections, and the map side of
  * the first aggregate — on a single core, no matter how many an
  * `Exchange` later fans out to. The fix is a repartition of the
  * COMPACT pre-expansion rows (guide §2.3: shuffle few bytes, expand
  * after; §6: scan parallelism floor), applied ONLY when the physical
  * scan is under-parallel: at production scale the file splits already
  * provide parallelism, the condition is false, and this is a no-op —
  * never an extra exchange.
  *
  * Keyed by a high-cardinality column (the caller's id) rather than
  * round-robin: keyless `repartition(n)` first pays a per-partition
  * sort of its input (`spark.sql.execution.sortBeforeRepartition`, on
  * by default so retries stay deterministic) — a pure waste here, and
  * hash-by-id is deterministic under retry by construction.
  *
  * Correctness: row-preserving, ordering-free. Every aggregate in this
  * repo is order-independent by the registry's own oracle discipline
  * (exact decimal grids), so partitioning never changes a result; the
  * DuckDB gate re-proves it for every touched query.
  */
object Par {

  /** `df` repartitioned to the session's default parallelism on
    * `keys` (hash), or `df` unchanged if its physical plan already
    * yields at least that many partitions. Keys should be
    * high-cardinality so the hash spreads evenly (§2.5).
    */
  def fan(df: DataFrame, keys: Column*): DataFrame = {
    require(keys.nonEmpty, "fan needs at least one hash key")
    val target = df.sparkSession.sparkContext.defaultParallelism
    // Read the partition count off the Dataset's OWN cached
    // QueryExecution: `df.rdd` would build a second, deserializing
    // QueryExecution (rddQueryExecution) — physically planning a wide
    // input twice just to read a number.
    val nParts = df.queryExecution.toRdd.getNumPartitions
    if (nParts >= target) df else df.repartition(target, keys: _*)
  }
}
