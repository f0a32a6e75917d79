package graft.maintenance

import org.apache.spark.sql.SparkSession

/** Small-file compaction — the table-maintenance pass every streaming
  * or micro-batch ingest eventually needs: thousands of KB-sized part
  * files per partition turn a 100 TB scan into a listing/open-cost
  * problem (driver-side listing, one task per tiny file, footer reads
  * dominating IO). Compaction rewrites a directory into
  * `ceil(bytes / targetFileBytes)` files of roughly even size via an
  * atomic write-then-swap (the [[graft.pipeline.Runner]] discipline),
  * so readers never observe a half-rewritten table.
  *
  * Shape: one read + one `repartition(n)` round-robin exchange + one
  * write — rows move once, no sort. Run it per PARTITION directory on
  * a partitioned table (compacting partitions independently keeps the
  * rewrite incremental and the partition pruning intact); the file
  * count comes from the directory's own byte size, so the operator
  * needs no statistics service.
  */
object Compaction {

  /** Total bytes of the parquet part files under `path`. */
  def dataBytes(spark: SparkSession, path: String): Long = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(path)).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
  }

  /** Rewrite the parquet directory at `path` into files of about
    * `targetFileBytes` (default 128 MiB — one HDFS-ish block / one
    * comfortable scan task per file). Returns the new file count.
    * No-op (returns the current count) when the directory already has
    * at most the target count — rewriting well-laid-out data would
    * churn 100 TB for nothing.
    */
  def compact(spark: SparkSession, path: String,
              targetFileBytes: Long = 128L << 20): Int = {
    require(targetFileBytes > 0, s"targetFileBytes must be > 0")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val current = fs.listStatus(new org.apache.hadoop.fs.Path(path)).toSeq
      .count(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    val n = math.max(1L,
      (dataBytes(spark, path) + targetFileBytes - 1) / targetFileBytes).toInt
    if (current <= n) current
    else {
      graft.pipeline.Runner.overwriteSwapped(
        spark.read.parquet(path).repartition(n), path)
      n
    }
  }
}
