package graft.audit

import org.apache.spark.sql.{Dataset, SparkSession}
import java.sql.Timestamp

/** Run-audit log (reference: database/layers/audit/audit_writer.py and
  * the audit.ingestion_log DDL, db_setup.py:314-331). A typed Dataset
  * appended per run — queryable like any other table.
  */
object Audit {

  final case class IngestionLog(
      runId: String,
      sourceName: String,
      tableName: String,
      recordsFetched: Long,
      recordsLoaded: Long,
      recordsFailed: Long,
      status: String,
      startTime: Timestamp,
      endTime: Option[Timestamp],
      durationSeconds: Option[Double],
      errorMessage: Option[String])

  def start(runId: String, source: String, table: String,
            now: Timestamp): IngestionLog =
    IngestionLog(runId, source, table, 0L, 0L, 0L, "running", now, None, None, None)

  def complete(log: IngestionLog, fetched: Long, loaded: Long, failed: Long,
               now: Timestamp): IngestionLog =
    log.copy(
      recordsFetched = fetched, recordsLoaded = loaded, recordsFailed = failed,
      status = if (failed == 0) "success" else "partial",
      endTime = Some(now),
      durationSeconds = Some((now.getTime - log.startTime.getTime) / 1000.0))

  def fail(log: IngestionLog, error: String, now: Timestamp): IngestionLog =
    log.copy(status = "failed", endTime = Some(now),
      durationSeconds = Some((now.getTime - log.startTime.getTime) / 1000.0),
      errorMessage = Some(error))

  /** Append audit rows to the log table (parquet directory). */
  def append(spark: SparkSession, logs: Seq[IngestionLog], path: String): Unit = {
    import spark.implicits._
    logs.toDS().write.mode("append").parquet(path)
  }

  def read(spark: SparkSession, path: String): Dataset[IngestionLog] = {
    import spark.implicits._
    spark.read.parquet(path).as[IngestionLog]
  }
}
