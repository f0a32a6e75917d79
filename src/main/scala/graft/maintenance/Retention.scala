package graft.maintenance

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maintenance operators (reference: scripts/cleanup.py:88-237 archive /
  * purge, scripts/backfill.py:155-246 ranged backfill). The reference
  * expresses these as SQL DELETEs; on immutable columnar storage they
  * are partition-level filter/rewrite operations. With date-partitioned
  * layout all three prune at the scan — at 100 TB a 7-day purge touches
  * 7 directories, not the table.
  */
object Retention {

  /** Rows that survive a retention purge (cleanup.py:209-237
    * `DELETE WHERE ts < cutoff` — we keep the complement).
    */
  def retain(df: DataFrame, tsCol: String, cutoff: Column): DataFrame =
    df.filter(col(tsCol) >= cutoff)

  /** Rows an archive run moves out (cleanup.py:88-135 delete-returning-
    * insert): the archived slice, stamped with the archive time.
    */
  def archiveSlice(df: DataFrame, tsCol: String, cutoff: Column,
                   archivedAt: Column): DataFrame =
    df.filter(col(tsCol) < cutoff).withColumn("_archived_at", archivedAt)

  /** The date window a backfill rewrites (backfill.py:176-194
    * `DELETE WHERE ts >= start AND ts < end` then re-ingest).
    */
  def backfillWindow(df: DataFrame, tsCol: String, start: Column, end: Column): DataFrame =
    df.filter(col(tsCol) >= start && col(tsCol) < end)

  /** Idempotent ranged rewrite: overwrite only the partitions present in
    * `replacement` (Spark dynamic partition overwrite — the engine-level
    * equivalent of the reference's DELETE-then-reinsert batches).
    */
  def overwritePartitions(replacement: DataFrame, path: String,
                          partitionCol: String): Unit = {
    val spark = replacement.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try replacement.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
    finally prev.foreach(spark.conf.set("spark.sql.sources.partitionOverwriteMode", _))
  }

  /** Metadata-level partition drop: delete every `partitionCol=<date>`
    * directory strictly before `cutoff`. This is the 100 TB half of an
    * archive move — the kept data is never rewritten; a 7-day purge
    * touches 7 directories. Returns the dropped partition values.
    */
  def dropPartitionsBefore(spark: SparkSession, path: String, partitionCol: String,
                           cutoff: java.time.LocalDate): Seq[String] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val base = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(_.getName.startsWith(s"$partitionCol="))
      .flatMap { p =>
        val value = p.getName.stripPrefix(s"$partitionCol=")
        scala.util.Try(java.time.LocalDate.parse(value)).toOption
          .filter(_.isBefore(cutoff))
          .map { _ => fs.delete(p, true); value }
      }
  }
}
