package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def media = Seq(
    (1L, "hello world"), (2L, ""), (3L, "abc")
  ).toDF("media_id", "payload")
    .select(col("media_id"), col("payload").cast("binary").as("media"))

  test("extractFeatures: deterministic stub features via mapPartitions") {
    val out1 = Multimodal.extractFeatures(media, featureDim = 4)
      .collect().sortBy(_.media_id)
    val out2 = Multimodal.extractFeatures(media, featureDim = 4)
      .collect().sortBy(_.media_id)
    assert(out1.map(_.checksum).sameElements(out2.map(_.checksum)))
    assert(out1(0).n_bytes == 11L)
    assert(out1(1).n_bytes == 0L && out1(1).checksum == 0L)
    assert(out1.forall(_.feature.length == 4))
    // checksum formula check for "abc": ((97*31+98)*31+99) % M
    assert(out1(2).checksum == ((97L * 31 + 98) * 31 + 99) % 1000000007L)
  }

  test("mediaStats reads bytes declaratively") {
    val out = Multimodal.mediaStats(media, "media_id", "media")
      .orderBy("media_id").collect()
    assert(out(0).getAs[Long]("media_bytes") == 11L)
    assert(out(0).getAs[Int]("head_byte") == 'h'.toInt)
  }

  test("frameSamplePlan emits bounded stride offsets") {
    val df = Seq((1L, "x" * 300)).toDF("media_id", "payload")
      .select(col("media_id"), col("payload").cast("binary").as("media"))
    val plan = Multimodal.frameSamplePlan(df, "media_id", "media",
      stride = 64, maxFrames = 4).collect()
    assert(plan.map(_.getAs[Long]("byte_offset")).toSeq == Seq(0L, 64L, 128L, 192L))
    assert(plan.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 1, 2, 3))
  }
}
