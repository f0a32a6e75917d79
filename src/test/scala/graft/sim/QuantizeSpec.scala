package graft.sim

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class QuantizeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def emb = Seq(
    (1L, Seq(0.0f, -1.0f, 5.0f)),
    (2L, Seq(1.0f, 1.0f, 5.0f)),
    (3L, Seq(0.5f, 0.0f, 5.0f))).toDF("vec_id", "embedding")

  test("codes hit the endpoints, midpoints round half-up, constant dim = 0") {
    val out = Quantize.sqEncode(emb, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // dim1 range [0,1]: 0→0, 1→255, 0.5→floor(127.5+0.5)=128
    // dim2 range [-1,1]: -1→0, 1→255, 0→floor(127.5+0.5)=128
    // dim3 constant → 0
    assert(out(1L) == Seq(0, 0, 0))
    assert(out(2L) == Seq(255, 255, 0))
    assert(out(3L) == Seq(128, 128, 0))
  }

  test("round-trip reconstruction error is bounded by range/510 per dim") {
    val dim = 16
    val vecs = (1L to 200L).map { i =>
      (i, (0 until dim).map(j =>
        (math.sin(i * 0.37 + j * 1.13) * (j + 1)).toFloat))
    }.toDF("vec_id", "embedding")
    val stats = Quantize.sqCalibrate(vecs, "vec_id", "embedding")
    val ranges = stats.collect()
      .map(r => r.getLong(0).toInt -> (r.getDouble(2) - r.getDouble(1)))
      .toMap
    val codes = Quantize.sqEncode(vecs, "vec_id", "embedding")
    val decoded = Quantize.sqDecode(codes, stats, "vec_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val orig = vecs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    orig.foreach { case (id, v) =>
      v.zipWithIndex.foreach { case (x, j) =>
        val bound = ranges(j + 1) / 510.0 + 1e-9
        assert(math.abs(decoded(id)(j) - x) <= bound,
          s"vec $id dim $j: |${decoded(id)(j)} - $x| > $bound")
      }
    }
  }

  test("plan shape: calibration aggregate + broadcast, no vector shuffle") {
    val out = Quantize.sqEncode(emb, "vec_id", "embedding")
    out.collect()
    graft.audit.PlanGuard.assertNoCartesian(out)
    // dim-stats exchange + the one-row collect_list reduce; the encode
    // itself is a projection over the scan
    graft.audit.PlanGuard.assertMaxExchanges(out, 2)
  }

  test("sqTopK ranks match brute-force top-k on the decoded corpus") {
    val dim = 8
    val vecs = (1L to 60L).map { i =>
      (i, (0 until dim).map(j =>
        (math.cos(i * 0.61 + j * 0.83) * (1.0 + j * 0.1)).toFloat))
    }.toDF("vec_id", "embedding")
    val codes = Quantize.sqEncode(vecs, "vec_id", "embedding")
    val stats = Quantize.sqCalibrate(vecs, "vec_id", "embedding")
    val queries = vecs.filter(org.apache.spark.sql.functions.col("vec_id") <= 2)
    val got = Quantize.sqTopK(codes, stats, queries, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    // brute force on driver: decode with the same affine map, cosine
    val st = stats.collect().map(r => r.getLong(0).toInt ->
      (r.getDouble(1), r.getDouble(2))).toMap
    val cd = codes.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    def dec(c: Seq[Int]): Seq[Double] = c.zipWithIndex.map { case (v, j) =>
      val (mn, mx) = st(j + 1); mn + v * (mx - mn) / 255.0 }
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val qs = queries.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    val exp = qs.flatMap { case (qid, qv) =>
      cd.toSeq.filter(_._1 != qid)
        .map { case (id, c) => (id, cos(dec(c), qv)) }
        .sortBy { case (id, s) => (-s, id) }.take(3).zipWithIndex
        .map { case ((id, _), i) => (qid, id, i + 1) }
    }.toSet
    assert(got == exp)
  }
}
