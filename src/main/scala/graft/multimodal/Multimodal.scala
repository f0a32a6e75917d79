package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video travel as opaque
  * `binary` columns next to typed metadata, and per-item decode /
  * feature-extraction runs as a partition-local stage (`mapPartitions`
  * over a typed Dataset — the Scala analogue of `mapInPandas`: one
  * decoder instantiation per partition, batch-shaped access, no
  * per-row driver involvement).
  *
  * The actual codec step is STUBBED (`decodeStub`): image/audio
  * libraries are not in this build, so it produces deterministic fake
  * features derived from the bytes. The Spark-side contract — schema,
  * partitioning, batch shape, null behavior — is real and tested;
  * swap `decodeStub` for a JNI/JavaCV decoder in production.
  */
object Multimodal {

  /** Canonical media-record schema: id + opaque payload + typed meta. */
  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("format", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))

  final case class MediaFeatures(media_id: Long, n_bytes: Long,
                                 checksum: Long, feature: Array[Float])

  /** STUB decoder — deterministic fake in place of a real codec.
    * Produces a byte-histogram-ish feature so downstream stages (dedup,
    * similarity) have realistic shapes to consume.
    */
  def decodeStub(bytes: Array[Byte], featureDim: Int): Array[Float] = {
    val f = new Array[Float](featureDim)
    var i = 0
    while (i < bytes.length) { f(i % featureDim) += (bytes(i) & 0xFF) / 255.0f; i += 1 }
    f
  }

  /** Partition-local decode/feature-extract over (media_id, media)
    * rows. Executors each process whole partitions — sized by the
    * upstream `repartition`, which is how you bound decoder memory at
    * 100 TB (many small partitions, each a decoder batch).
    */
  def extractFeatures(df: DataFrame, featureDim: Int = 8): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("media_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // one decoder context per partition lives here
        rows.map { case (id, bytes) =>
          val b = if (bytes == null) Array.empty[Byte] else bytes
          var crc = 0L
          b.foreach(x => crc = (crc * 31 + (x & 0xFF)) % 1000000007L)
          MediaFeatures(id, b.length.toLong, crc, decodeStub(b, featureDim))
        }
      }
  }

  /** Declarative media stats — byte length and head byte straight off
    * the binary column, no decode round-trip.
    */
  def mediaStats(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(
      col(idCol),
      length(col(binCol)).cast("long").as("media_bytes"),
      ascii(col(binCol).cast("string")).as("head_byte"))

  /** Deterministic frame sampling plan for video-ish payloads: every
    * `stride`-th offset up to `maxFrames` — the partition/batch shape a
    * real frame sampler would use.
    */
  def frameSamplePlan(df: DataFrame, idCol: String, binCol: String,
                      stride: Int, maxFrames: Int): DataFrame =
    df.select(col(idCol), length(col(binCol)).cast("long").as("n_bytes"))
      .select(col(idCol), col("n_bytes"),
        posexplode(sequence(lit(0L),
          least(col("n_bytes") - 1, lit(stride.toLong * (maxFrames - 1))),
          lit(stride.toLong))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "byte_offset")
}
