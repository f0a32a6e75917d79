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

  test("decodeImageInfo round-trips real PNG bytes (dims, channels, means)") {
    val ids = Seq(3L, 10L, 260L).toDF("doc_id")
    val out = Multimodal.decodeImageInfo(Multimodal.encodeTestImages(ids, "doc_id"))
      .collect().sortBy(_.media_id)
    out.foreach { r =>
      assert(r.ok, r.toString)
      assert(r.width == (r.media_id % 7 + 1).toInt, r.toString)
      assert(r.height == (r.media_id % 5 + 1).toInt, r.toString)
      assert(r.channels == 3, r.toString)
      assert(r.mean_r == (r.media_id % 256).toInt, r.toString)
      assert(r.mean_g == (r.media_id * 7 % 256).toInt, r.toString)
      assert(r.mean_b == (r.media_id * 13 % 256).toInt, r.toString)
    }
  }

  test("decodeImageInfo decodes a non-uniform JPEG's dimensions and averages pixels") {
    // 2x1 PNG with distinct pixels: mean is the floor'd per-channel avg
    val img = new java.awt.image.BufferedImage(2, 1,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    img.setRGB(0, 0, (10 << 16) | (20 << 8) | 30)
    img.setRGB(1, 0, (21 << 16) | (40 << 8) | 51)
    val png = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", png)
    val jpg = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", jpg)
    val rows = Seq((1L, png.toByteArray), (2L, jpg.toByteArray))
      .toDF("media_id", "media")
    val out = Multimodal.decodeImageInfo(rows).collect().sortBy(_.media_id)
    assert(out(0).ok && out(0).width == 2 && out(0).height == 1)
    assert((out(0).mean_r, out(0).mean_g, out(0).mean_b) == ((15, 30, 40)))
    // JPEG is lossy: dimensions are exact, pixels only approximate
    assert(out(1).ok && out(1).width == 2 && out(1).height == 1)
  }

  test("decodeImageInfo degrades corrupt/empty/null payloads to ok=false") {
    val rows = Seq(
      (1L, Array[Byte](1, 2, 3, 4)),
      (2L, Array.empty[Byte]),
      (3L, null.asInstanceOf[Array[Byte]])
    ).toDF("media_id", "media")
    val out = Multimodal.decodeImageInfo(rows).collect().sortBy(_.media_id)
    assert(out.length == 3 && out.forall(r => !r.ok && r.width == 0))
  }

  test("decodeAudioInfo round-trips real WAV bytes (format, frames, amplitude)") {
    val ids = Seq(3L, 17L, 30017L).toDF("doc_id")
    val out = Multimodal.decodeAudioInfo(Multimodal.encodeTestWavs(ids, "doc_id"))
      .collect().sortBy(_.media_id)
    out.foreach { r =>
      assert(r.ok, r.toString)
      assert(r.sample_rate == 8000 && r.channels == 1 && r.bits == 16, r.toString)
      assert(r.n_frames == r.media_id % 100 + 1, r.toString)
      assert(r.mean_amp == r.media_id % 30000 - 15000, r.toString)
    }
  }

  test("decodeAudioInfo degrades corrupt/non-WAV payloads to ok=false") {
    val rows = Seq(
      (1L, Array[Byte](1, 2, 3, 4)),
      (2L, Array.empty[Byte]),
      (3L, "not audio".getBytes("UTF-8"))
    ).toDF("media_id", "media")
    val out = Multimodal.decodeAudioInfo(rows).collect()
    assert(out.length == 3 && out.forall(r => !r.ok && r.n_frames == 0L))
  }

  test("audioSignalStats: square-wave fixtures match the closed forms") {
    val ids = Seq(23L, 40L, 157L).toDF("doc_id")
    val got = Multimodal.audioSignalStats(
        Multimodal.encodeTestWavsSquare(ids, "doc_id"))
      .collect().map(a => a.media_id -> a).toMap
    for (id <- Seq(23L, 40L, 157L)) {
      val n = id % 100 + 20
      val amp = (id * 7919) % 40000 - 20000
      val p = id % 7 + 2
      val a = got(id)
      assert(a.ok && a.n_samples == n)
      assert(a.peak_amp == math.abs(amp))
      assert(a.sum_sq == n * amp * amp)
      assert(a.zero_crossings == (if (amp == 0) 0L else (n - 1) / p))
      assert(a.clipped == (if (math.abs(amp) >= 15000) n else 0L))
    }
  }

  test("audioSignalStats counts a crossing across intervening silence") {
    // +500, 0, -500: one crossing under the last-non-zero-sign
    // definition (a raw-predecessor compare would report zero)
    def wav(samples: Seq[Short]): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val data = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (s, i) =>
        data(2 * i) = (s & 0xFF).toByte
        data(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val df = Seq(
      (1L, wav(Seq[Short](500, 0, -500))),
      (2L, wav(Seq[Short](500, 0, 500)))   // same sign resumes: none
    ).toDF("media_id", "media")
    val got = Multimodal.audioSignalStats(df).collect()
      .map(a => a.media_id -> a).toMap
    assert(got(1L).zero_crossings == 1L && got(1L).peak_amp == 500L)
    assert(got(1L).sum_sq == 500L * 500 * 2)
    assert(got(2L).zero_crossings == 0L)
  }

  test("audioSignalStats degrades corrupt payloads to ok=false") {
    val df = Seq((9L, Array[Byte](1, 2, 3)), (10L, Array.empty[Byte]))
      .toDF("media_id", "media")
    val got = Multimodal.audioSignalStats(df).collect()
      .map(a => a.media_id -> a.ok).toMap
    assert(got == Map(9L -> false, 10L -> false))
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
