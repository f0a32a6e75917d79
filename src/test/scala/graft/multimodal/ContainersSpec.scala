package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class ContainersSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ids = (0L until 200L).toDF("media_id")

  test("decodeMp4Info round-trips the ISO-BMFF fixture (brand, duration, dims, handler)") {
    val got = Containers.decodeMp4Info(
        Containers.encodeTestMp4s(ids, "media_id"))
      .collect().map(i => i.media_id -> i).toMap
    assert(got.size == 200)
    got.foreach { case (id, i) =>
      assert(i.ok, s"id=$id")
      assert(i.major_brand == "isom")
      assert(i.timescale == 600L)
      assert(i.duration_ms == (id % 9000 + 600) * 1000 / 600)
      assert(i.n_tracks == 1)
      assert(i.handler == "vide")
      assert(i.width == (id % 320 + 16).toInt)
      assert(i.height == (id % 240 + 16).toInt)
    }
  }

  test("decodeMp4Info parses a version-1 (64-bit) mvhd and tkhd") {
    // hand-build a moov whose mvhd/tkhd use version 1 layouts: the
    // fixture generator only emits v0, so cover the v1 offsets directly
    def u32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
        ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def u64(v: Long): Array[Byte] = u32(v >> 32) ++ u32(v & 0xFFFFFFFFL)
    def box(t: String, p: Array[Byte]): Array[Byte] =
      u32(p.length + 8L) ++ t.getBytes("ISO-8859-1") ++ p
    val mvhd = box("mvhd",
      Array[Byte](1, 0, 0, 0) ++ u64(0) ++ u64(0) ++ u32(1000) ++ u64(7500) ++
        new Array[Byte](80))
    val tkhd = box("tkhd",
      Array[Byte](1, 0, 0, 7) ++ u64(0) ++ u64(0) ++ u32(1) ++ u32(0) ++
        u64(7500) ++ new Array[Byte](52) ++ u32(1280L << 16) ++ u32(720L << 16))
    val hdlr = box("hdlr", u32(0) ++ u32(0) ++ "soun".getBytes("ISO-8859-1") ++
      new Array[Byte](13))
    val media = box("moov", mvhd ++ box("trak", tkhd ++ box("mdia", hdlr)))
    val got = Containers.decodeMp4Info(
        Seq((1L, media)).toDF("media_id", "media"))
      .collect().head
    assert(got.ok && got.timescale == 1000L && got.duration_ms == 7500L &&
      got.width == 1280 && got.height == 720 && got.handler == "soun")
  }

  test("decodeMp4Info degrades garbage, truncation, and overrunning boxes to ok=false") {
    val fixture = Containers.encodeTestMp4s(Seq(5L).toDF("media_id"), "media_id")
      .collect().head.getAs[Array[Byte]]("media")
    val cases = Seq(
      1L -> Array[Byte](1, 2, 3),                        // too short
      2L -> Array.fill[Byte](64)(0x41),                  // garbage (box overrun)
      3L -> fixture.take(fixture.length / 2),            // truncated mid-box
      4L -> (null: Array[Byte]))                         // null payload
    val got = Containers.decodeMp4Info(cases.toDF("media_id", "media"))
      .collect()
    assert(got.length == 4 && got.forall(!_.ok))
  }

  test("decodeMp3Info round-trips the CBR fixture (tables, frames, duration)") {
    val br = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    val sr = Array(44100, 48000, 32000)
    val got = Containers.decodeMp3Info(
        Containers.encodeTestMp3s(ids, "media_id"))
      .collect().map(i => i.media_id -> i).toMap
    assert(got.size == 200)
    got.foreach { case (id, i) =>
      assert(i.ok, s"id=$id")
      assert(i.mpeg_version == 1 && i.layer == 3)
      assert(i.bitrate_kbps == br((id % 14 + 1).toInt))
      assert(i.sample_rate == sr((id % 3).toInt))
      assert(i.channels == (if (id % 4 == 3) 1 else 2))
      assert(i.n_frames == id % 40 + 1)
      assert(i.duration_ms == (id % 40 + 1) * 1152L * 1000L / sr((id % 3).toInt))
    }
  }

  test("decodeMp3Info: trailing garbage ends the walk; bad payloads degrade") {
    val fixture = Containers.encodeTestMp3s(Seq(7L).toDF("media_id"), "media_id")
      .collect().head.getAs[Array[Byte]]("media")
    // 7 % 40 + 1 = 8 frames; appending garbage must not change the count
    val withTrailer = fixture ++ Array.fill[Byte](100)(0x33)
    val trailer = Containers.decodeMp3Info(
        Seq((7L, withTrailer)).toDF("media_id", "media"))
      .collect().head
    assert(trailer.ok && trailer.n_frames == 8L)
    val bad = Containers.decodeMp3Info(Seq(
        (1L, Array[Byte](1, 2)),                 // too short
        (2L, Array.fill[Byte](64)(0x41)),        // no sync
        (3L, null: Array[Byte]),                 // null
        // valid sync but MPEG-2 (version bits 10): out of scope -> bad
        (4L, Array[Byte](0xFF.toByte, 0xF3.toByte, 0x42, 0x00)))
      .toDF("media_id", "media"))
      .collect()
    assert(bad.length == 4 && bad.forall(!_.ok))
  }
}
