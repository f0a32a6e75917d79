package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Container-level metadata for compressed media — the part of
  * MP4/MP3-class payloads that IS parseable without a codec. The JDK
  * ships no H.264/AAC/MP3 decoder, so sample DECODE stays behind the
  * labeled [[Multimodal.decodeStub]]; but duration, dimensions, codec
  * identity, and frame structure live in the container headers, which
  * are public-specification byte layouts (ISO/IEC 14496-12 box
  * structure for MP4; the MPEG-1/2 audio frame header for MP3) and
  * parse with nothing but index arithmetic. That metadata is what a
  * 100 TB curation pipeline filters on — drop sub-second clips, keep
  * 720p+, route by codec — long before anything is decoded.
  *
  * Both parsers run as the same partition-local `mapPartitions` stage
  * as [[Multimodal.decodeImageInfo]], with the same degradation
  * contract: any malformed payload (truncated box, bad sync, garbage)
  * yields an `ok = false` row via a NonFatal guard, never a stage
  * failure.
  */
object Containers {

  // ---------------------------------------------------------------- MP4

  final case class Mp4Info(media_id: Long, ok: Boolean, major_brand: String,
                           timescale: Long, duration_ms: Long, n_tracks: Int,
                           handler: String, width: Int, height: Int)

  /** ISO-BMFF (MP4/MOV) box-tree walk: `ftyp` major brand, `mvhd`
    * timescale + duration (→ milliseconds, floor), track count, first
    * track's `hdlr` handler fourcc and `tkhd` presentation dimensions
    * (16.16 fixed point, integer part). Boxes are `[size:u32][type:4cc]
    * [payload]`; `size == 1` means a u64 largesize follows (handled),
    * `size == 0` means to-end-of-file. Only the container boxes needed
    * for the walk (`moov`, `trak`, `mdia`) are descended into.
    */
  def decodeMp4Info(df: DataFrame, idCol: String = "media_id",
                    binCol: String = "media"): Dataset[Mp4Info] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val bad = Mp4Info(id, ok = false, "", 0L, 0L, 0, "", 0, 0)
          if (bytes == null || bytes.length < 8) bad
          else try parseMp4(id, bytes)
          catch { case scala.util.control.NonFatal(_) => bad }
        }
      }
  }

  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
      ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)

  private def u64(b: Array[Byte], o: Int): Long =
    (u32(b, o) << 32) | u32(b, o + 4)

  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** Iterate sibling boxes in b[from, to): calls f(type, payloadStart,
    * payloadEnd). Malformed sizes throw (caught by the NonFatal guard).
    */
  private def walkBoxes(b: Array[Byte], from: Int, to: Int)
                       (f: (String, Int, Int) => Unit): Unit = {
    var o = from
    while (o + 8 <= to) {
      val size32 = u32(b, o)
      val typ = fourcc(b, o + 4)
      val (payload, end) =
        if (size32 == 1L) (o + 16, o + u64(b, o + 8))
        else if (size32 == 0L) (o + 8, to.toLong)
        else (o + 8, o + size32)
      if (end < payload || end > to) throw new IllegalArgumentException(
        s"box $typ overruns: $end > $to")
      f(typ, payload, end.toInt)
      o = end.toInt
    }
  }

  private def parseMp4(id: Long, b: Array[Byte]): Mp4Info = {
    var brand = ""
    var timescale = 0L
    var durationUnits = 0L
    var nTracks = 0
    var handler = ""
    var width = 0
    var height = 0
    walkBoxes(b, 0, b.length) {
      case ("ftyp", p, _) => brand = fourcc(b, p)
      case ("moov", p0, e0) =>
        walkBoxes(b, p0, e0) {
          case ("mvhd", p, _) =>
            val v = b(p) & 0xFF
            if (v == 1) { timescale = u32(b, p + 20); durationUnits = u64(b, p + 24) }
            else { timescale = u32(b, p + 12); durationUnits = u32(b, p + 16) }
          case ("trak", p1, e1) =>
            nTracks += 1
            val firstTrack = nTracks == 1
            walkBoxes(b, p1, e1) {
              case ("tkhd", p, _) if firstTrack =>
                val v = b(p) & 0xFF
                // width/height are the LAST 8 bytes of tkhd, 16.16
                // fixed: ver/flags + times/ids/duration (v1 widens the
                // three time fields) + 8 reserved + layer/group +
                // volume/reserved + 36-byte matrix
                val wOff = p + (if (v == 1) 88 else 76)
                width = (u32(b, wOff) >> 16).toInt
                height = (u32(b, wOff + 4) >> 16).toInt
              case ("mdia", p2, e2) if firstTrack =>
                walkBoxes(b, p2, e2) {
                  case ("hdlr", p, _) => handler = fourcc(b, p + 8)
                  case _ =>
                }
              case _ =>
            }
          case _ =>
        }
      case _ =>
    }
    if (timescale <= 0L) Mp4Info(id, ok = false, "", 0L, 0L, 0, "", 0, 0)
    else Mp4Info(id, ok = true, brand, timescale,
      durationUnits * 1000L / timescale, nTracks, handler, width, height)
  }

  /** Deterministic minimal-MP4 fixture: `ftyp(isom)` + `moov(mvhd +
    * trak(tkhd + mdia(hdlr)))` with id-derived timescale-600 duration
    * (`id % 9000 + 600` units → `(id % 9000 + 600) ÷ 0.6` ms floor),
    * `(id % 320 + 16) × (id % 240 + 16)` dimensions, and a `vide`
    * handler — so [[decodeMp4Info]]'s walk is oracle-checkable from the
    * id alone (q133), the ISO-BMFF twin of
    * [[Multimodal.encodeTestImages]].
    */
  def encodeTestMp4s(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val dur = id % 9000 + 600
          val w = (id % 320 + 16).toInt
          val h = (id % 240 + 16).toInt
          (id, buildMp4(dur, w, h))
        }
      }
      .toDF("media_id", "media")
  }

  private def putU32(buf: java.io.ByteArrayOutputStream, v: Long): Unit = {
    buf.write(((v >> 24) & 0xFF).toInt); buf.write(((v >> 16) & 0xFF).toInt)
    buf.write(((v >> 8) & 0xFF).toInt); buf.write((v & 0xFF).toInt)
  }

  private def box(typ: String, payload: Array[Byte]): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    putU32(buf, payload.length + 8L)
    buf.write(typ.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    buf.write(payload)
    buf.toByteArray
  }

  private def buildMp4(durationUnits: Long, w: Int, h: Int): Array[Byte] = {
    val ftyp = box("ftyp", {
      val p = new java.io.ByteArrayOutputStream()
      p.write("isom".getBytes("ISO-8859-1")); putU32(p, 512L)
      p.write("isom".getBytes("ISO-8859-1")); p.write("iso2".getBytes("ISO-8859-1"))
      p.toByteArray
    })
    val mvhd = box("mvhd", {
      val p = new java.io.ByteArrayOutputStream()
      putU32(p, 0L) // version 0 + flags
      putU32(p, 0L); putU32(p, 0L) // ctime, mtime
      putU32(p, 600L) // timescale
      putU32(p, durationUnits)
      putU32(p, 0x00010000L); p.write(0x01); p.write(0x00) // rate, volume
      p.write(new Array[Byte](10)) // reserved
      Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L)
        .foreach(putU32(p, _)) // unity matrix
      p.write(new Array[Byte](24)) // pre_defined
      putU32(p, 2L) // next_track_ID
      p.toByteArray
    })
    val tkhd = box("tkhd", {
      val p = new java.io.ByteArrayOutputStream()
      putU32(p, 7L) // version 0 + enabled/in-movie/in-preview flags
      putU32(p, 0L); putU32(p, 0L) // ctime, mtime
      putU32(p, 1L) // track_ID
      putU32(p, 0L) // reserved
      putU32(p, durationUnits)
      p.write(new Array[Byte](8)) // reserved
      p.write(new Array[Byte](4)) // layer + alternate_group
      p.write(new Array[Byte](4)) // volume + reserved
      Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L)
        .foreach(putU32(p, _)) // unity matrix
      putU32(p, w.toLong << 16); putU32(p, h.toLong << 16) // 16.16 fixed
      p.toByteArray
    })
    val hdlr = box("hdlr", {
      val p = new java.io.ByteArrayOutputStream()
      putU32(p, 0L) // version + flags
      putU32(p, 0L) // pre_defined
      p.write("vide".getBytes("ISO-8859-1"))
      p.write(new Array[Byte](12)) // reserved
      p.write("graft video handler".getBytes("ISO-8859-1")); p.write(0)
      p.toByteArray
    })
    val mdia = box("mdia", hdlr)
    val trak = box("trak", tkhd ++ mdia)
    val moov = box("moov", mvhd ++ trak)
    ftyp ++ moov
  }

  // ---------------------------------------------------------------- MP3

  final case class Mp3Info(media_id: Long, ok: Boolean, mpeg_version: Int,
                           layer: Int, bitrate_kbps: Int, sample_rate: Int,
                           channels: Int, n_frames: Long, duration_ms: Long)

  /** MPEG-1 Layer III bitrate table (kbps), index 1-14 (0 = free,
    * 15 = reserved) — ISO/IEC 11172-3 Table B.1.
    */
  private val Mpeg1L3Bitrates =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mpeg1SampleRates = Array(44100, 48000, 32000)

  /** MP3 frame walk: skip a leading ID3v2 tag (syncsafe size), then
    * parse each 4-byte frame header — 11-bit sync, version, layer,
    * bitrate index, sample-rate index, padding, channel mode — and hop
    * `144·bitrate/samplerate + padding` bytes to the next frame
    * (MPEG-1 Layer III frame-length formula). Emits the FIRST frame's
    * format, the walked frame count, and the CBR duration
    * `frames · 1152 / samplerate` in floor'd ms. Stops at the first
    * lost sync (trailing garbage ⇒ shorter walk, not a crash); a
    * payload with no valid first frame is `ok = false`. Restricted to
    * MPEG-1 Layer III (the "MP3" in scope); other version/layer combos
    * degrade to `ok = false` rather than guessing at their tables.
    */
  def decodeMp3Info(df: DataFrame, idCol: String = "media_id",
                    binCol: String = "media"): Dataset[Mp3Info] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val bad = Mp3Info(id, ok = false, 0, 0, 0, 0, 0, 0L, 0L)
          if (bytes == null || bytes.length < 4) bad
          else try parseMp3(id, bytes)
          catch { case scala.util.control.NonFatal(_) => bad }
        }
      }
  }

  private def parseMp3(id: Long, b: Array[Byte]): Mp3Info = {
    val bad = Mp3Info(id, ok = false, 0, 0, 0, 0, 0, 0L, 0L)
    var o = 0
    // ID3v2: "ID3" vv f ssss (syncsafe 7-bit bytes)
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val sz = ((b(6) & 0x7F) << 21) | ((b(7) & 0x7F) << 14) |
        ((b(8) & 0x7F) << 7) | (b(9) & 0x7F)
      o = 10 + sz
    }
    var first: Option[(Int, Int, Int)] = None // bitrate, samplerate, channels
    var frames = 0L
    var sync = true
    while (sync && o + 4 <= b.length) {
      val h0 = b(o) & 0xFF; val h1 = b(o + 1) & 0xFF
      val h2 = b(o + 2) & 0xFF; val h3 = b(o + 3) & 0xFF
      // sync = 11 ones; version bits 19-20 (3 = MPEG1); layer bits 17-18
      // (1 = Layer III)
      if (h0 != 0xFF || (h1 & 0xE0) != 0xE0) sync = false
      else {
        val version = (h1 >> 3) & 0x3
        val layer = (h1 >> 1) & 0x3
        val brIdx = (h2 >> 4) & 0xF
        val srIdx = (h2 >> 2) & 0x3
        val padding = (h2 >> 1) & 0x1
        val chMode = (h3 >> 6) & 0x3
        if (version != 3 || layer != 1 || brIdx == 0 || brIdx == 15 || srIdx == 3)
          sync = false
        else {
          val bitrate = Mpeg1L3Bitrates(brIdx)
          val sampleRate = Mpeg1SampleRates(srIdx)
          val chans = if (chMode == 3) 1 else 2
          if (first.isEmpty) first = Some((bitrate, sampleRate, chans))
          frames += 1
          o += 144 * bitrate * 1000 / sampleRate + padding
        }
      }
    }
    first match {
      case None => bad
      case Some((br, sr, ch)) =>
        Mp3Info(id, ok = true, mpeg_version = 1, layer = 3, bitrate_kbps = br,
          sample_rate = sr, channels = ch, n_frames = frames,
          duration_ms = frames * 1152L * 1000L / sr)
    }
  }

  /** Deterministic MP3 fixture: an ID3v2 tag of `id % 64` padding bytes,
    * then `id % 40 + 1` CBR frames — bitrate index `id % 14 + 1`,
    * sample-rate index `id % 3`, channel mode `id % 4`, zeroed payloads
    * (container metadata needs no audio). [[decodeMp3Info]] must walk
    * exactly those frames and report the table values the indexes name,
    * all predictable from the id in SQL (q134).
    */
  def encodeTestMp3s(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val brIdx = (id % 14 + 1).toInt
          val srIdx = (id % 3).toInt
          val chMode = (id % 4).toInt
          val nFrames = (id % 40 + 1).toInt
          val id3pad = (id % 64).toInt
          val buf = new java.io.ByteArrayOutputStream()
          // ID3v2 header: "ID3", version 4.0, no flags, syncsafe size
          buf.write('I'); buf.write('D'); buf.write('3')
          buf.write(4); buf.write(0); buf.write(0)
          buf.write((id3pad >> 21) & 0x7F); buf.write((id3pad >> 14) & 0x7F)
          buf.write((id3pad >> 7) & 0x7F); buf.write(id3pad & 0x7F)
          buf.write(new Array[Byte](id3pad))
          val frameLen =
            144 * Mpeg1L3Bitrates(brIdx) * 1000 / Mpeg1SampleRates(srIdx)
          var f = 0
          while (f < nFrames) {
            buf.write(0xFF); buf.write(0xFB) // sync + MPEG1 + Layer III + no CRC
            buf.write((brIdx << 4) | (srIdx << 2)) // no padding bit
            buf.write(chMode << 6)
            buf.write(new Array[Byte](frameLen - 4))
            f += 1
          }
          (id, buf.toByteArray)
        }
      }
      .toDF("media_id", "media")
  }
}
