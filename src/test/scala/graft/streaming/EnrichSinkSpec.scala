package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.TestSpark

class EnrichSinkSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("enrichSink left-joins the dim per batch and matches the batch join") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_enrich_").toString
    val dim = Seq((1L, "AUTO"), (2L, "HOME")).toDF("user_id", "segment")
    val input = MemoryStream[(Long, Long)]
    val sq = Streams.enrichSink(
      input.toDF().toDF("event_id", "user_id"), dim, "user_id",
      Seq("segment"), s"$tmp/out", s"$tmp/ckpt")
    try {
      input.addData((10L, 1L), (11L, 3L)) // 3 has no dim row -> null
      sq.processAllAvailable()
      input.addData((12L, 2L))
      sq.processAllAvailable()
    } finally sq.stop()
    val res = spark.read.parquet(s"$tmp/out")
    // using-column join order: key, stream cols, dim cols
    assert(res.columns.toSeq == Seq("user_id", "event_id", "segment"))
    val out = res.collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[String]("segment")).getOrElse("-"))
      .toMap
    assert(out == Map(10L -> "AUTO", 11L -> "-", 12L -> "HOME"))
  }
}
