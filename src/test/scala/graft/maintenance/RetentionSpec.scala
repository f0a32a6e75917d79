package graft.maintenance

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import graft.TestSpark

class RetentionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def events = Seq(
    (1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-05 10:00:00")),
    (3L, ts("2024-01-10 10:00:00")), (4L, ts("2024-01-15 10:00:00"))
  ).toDF("id", "ts")

  private val cutoff = to_timestamp(lit("2024-01-08 00:00:00"))

  test("retain + archiveSlice partition the table exactly") {
    val kept = Retention.retain(events, "ts", cutoff)
    val archived = Retention.archiveSlice(events, "ts", cutoff,
      to_timestamp(lit("2024-02-01 00:00:00")))
    assert(kept.count() + archived.count() == events.count())
    assert(kept.select("id").as[Long].collect().toSet == Set(3L, 4L))
    assert(archived.columns.contains("_archived_at"))
  }

  test("backfillWindow is a half-open interval") {
    val w = Retention.backfillWindow(events, "ts",
      to_timestamp(lit("2024-01-05 10:00:00")),
      to_timestamp(lit("2024-01-15 10:00:00")))
    assert(w.select("id").as[Long].collect().toSet == Set(2L, 3L))
  }

  test("compact bin-packs small files without changing the data") {
    val dir = java.nio.file.Files.createTempDirectory("compact").toString + "/table"
    // 3 appends x 8 partitions = 24 tiny files
    (1 to 3).foreach { i =>
      spark.range(i * 1000, i * 1000 + 100).toDF("v")
        .withColumn("day", (col("v") % 2).cast("string"))
        .repartition(8)
        .write.mode("append").partitionBy("day").parquet(dir)
    }
    val beforeData = spark.read.parquet(dir)
      .select("v", "day").as[(Long, String)].collect().toSet
    val (before, after) = Retention.compact(spark, dir,
      targetBytes = 128L << 20, partitionCol = Some("day"))
    assert(before >= 24)
    assert(after <= 2) // one output slot, split across the 2 day dirs
    val afterData = spark.read.parquet(dir)
      .select("v", "day").as[(Long, String)].collect().toSet
    assert(afterData == beforeData)
  }

  test("compact works on unpartitioned tables") {
    val dir = java.nio.file.Files.createTempDirectory("compactu").toString + "/table"
    spark.range(0, 1000).toDF("v").repartition(16).write.parquet(dir)
    val (before, after) = Retention.compact(spark, dir)
    assert(before == 16 && after == 1)
    assert(spark.read.parquet(dir).count() == 1000)
  }

  test("overwritePartitions rewrites only touched partitions, idempotently") {
    val dir = java.nio.file.Files.createTempDirectory("retention").toString + "/table"
    val full = Seq(("2024-01-01", 1L), ("2024-01-02", 2L), ("2024-01-03", 3L))
      .toDF("day", "v")
    full.write.partitionBy("day").parquet(dir)
    // replace one day with restated values; other partitions untouched
    val restated = Seq(("2024-01-02", 99L)).toDF("day", "v")
    Retention.overwritePartitions(restated, dir, "day")
    Retention.overwritePartitions(restated, dir, "day") // idempotent
    val back = spark.read.parquet(dir)
      .select("day", "v").as[(String, Long)].collect().toSet
    assert(back == Set(("2024-01-01", 1L), ("2024-01-02", 99L), ("2024-01-03", 3L)))
  }
}
