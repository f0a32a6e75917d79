package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (int8) quantization of embedding vectors with per-dimension
  * min/max calibration — the standard 4× memory cut for vector serving
  * (float32 → uint8 per component, reconstruction error bounded by
  * range/510 per dimension). Complements PQ ([[Pq]]): PQ is the 32×
  * lossy codes-only layout, SQ the near-lossless one that still
  * supports exact-ish rescoring without fetching float vectors.
  *
  * At 100 TB: calibration is one narrow aggregate (dim → min/max, rows
  * = dimensionality), the calibration row broadcasts into a pure
  * projection encode — no shuffle touches the vectors themselves.
  * Quantization uses only IEEE +,-,·,/ and floor, so codes are
  * bit-identical on any engine (no transcendentals anywhere).
  *
  * The per-element lambda here is a single interpreted HOF — fine for
  * one arithmetic expression per component (the q124 fusion was about
  * a 128-SUBTREE plan, not about lambdas per se); fuse into a native
  * expression only if profiling shows the encode on the hot path.
  */
object Quantize {

  private def toDouble(vec: Column): Column =
    transform(vec, x => x.cast("double"))

  /** Per-dimension (1-based dim, min, max) calibration table. */
  def sqCalibrate(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(posexplode(toDouble(col(vecCol))))
      .select((col("pos") + 1).cast("long").as("dim"), col("col").as("x"))
      .groupBy("dim").agg(min(col("x")).as("mn"), max(col("x")).as("mx"))

  /** Encode vectors to uint8 codes (array<int>, values 0..255):
    * `code = clamp(floor((x - mn) · 255 / (mx - mn) + 0.5), 0, 255)`,
    * 0 where the dimension is constant.
    */
  def sqEncode(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val stats = sqCalibrate(emb, idCol, vecCol)
      .select(struct(col("dim"), col("mn"), col("mx")).as("s"))
      .agg(sort_array(collect_list(col("s"))).as("ss"))
      .select(transform(col("ss"), s => s.getField("mn")).as("__mns"),
        transform(col("ss"), s => s.getField("mx")).as("__mxs"))
    emb.crossJoin(broadcast(stats))
      .select(col(idCol),
        transform(toDouble(col(vecCol)), (x, i) => {
          val mn = element_at(col("__mns"), i + 1)
          val mx = element_at(col("__mxs"), i + 1)
          when(mx === mn, lit(0L)).otherwise(
            least(greatest(floor((x - mn) * lit(255.0) / (mx - mn)
              + lit(0.5)), lit(0L)), lit(255L)))
        }.cast("int")).as("codes"))
  }

  /** Serving path over the quantized corpus: decode codes on the fly
    * (a projection — the fetched bytes are the 64 codes, not 256 bytes
    * of floats) and rank by exact-query cosine. This is the SQ
    * analogue of PQ's ADC ([[Pq.pqTopK]]): ~4× less scan traffic than
    * float32 serving at near-lossless recall (error ≤ range/510 per
    * dim), where PQ's 32× compression costs real recall. Ranking
    * reuses [[Similarity.bruteTopK]]'s (sim desc, id) discipline.
    */
  def sqTopK(codes: DataFrame, stats: DataFrame, queries: DataFrame,
             idCol: String, vecCol: String, k: Int): DataFrame = {
    val dec = sqDecode(codes, stats, idCol)
      .withColumnRenamed("vec_hat", vecCol)
    Similarity.bruteTopK(dec, queries, idCol, vecCol, k)
  }

  /** Decode codes back to doubles with the same calibration frame:
    * `x̂ = mn + code · (mx - mn) / 255`.
    */
  def sqDecode(codes: DataFrame, stats: DataFrame, idCol: String,
               codesCol: String = "codes"): DataFrame = {
    val row = stats
      .select(struct(col("dim"), col("mn"), col("mx")).as("s"))
      .agg(sort_array(collect_list(col("s"))).as("ss"))
      .select(transform(col("ss"), s => s.getField("mn")).as("__mns"),
        transform(col("ss"), s => s.getField("mx")).as("__mxs"))
    codes.crossJoin(broadcast(row))
      .select(col(idCol),
        transform(col(codesCol), (c, i) => {
          val mn = element_at(col("__mns"), i + 1)
          val mx = element_at(col("__mxs"), i + 1)
          mn + c.cast("double") * (mx - mn) / lit(255.0)
        }).as("vec_hat"))
  }
}
