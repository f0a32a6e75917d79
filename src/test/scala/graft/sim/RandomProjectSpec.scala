package graft.sim

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class RandomProjectSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def planeSign(j: Int, d: Int, dim: Int, seed: Long): Double = {
    import graft.operators.Sample
    val k = j.toLong * dim + d
    val h = (k % Sample.Prime) * (Sample.Mult + seed) %
      Sample.Prime2 * Sample.Mult2 % 1000000L
    if (h < 500000L) 1.0 else -1.0
  }

  test("projection equals the hand-computed signed sum over sqrt(dim)") {
    val dim = 64
    val vecs = Seq(
      (1L, (0 until dim).map(i => (i % 7).toDouble - 3.0)),
      (2L, (0 until dim).map(i => math.sin(i.toDouble))))
    val got = vecs.toDF("id", "v")
      .select(col("id"),
        Similarity.randomProject(col("v"), 16, dim, seed = 11L).as("p"))
      .as[(Long, Seq[Double])].collect().toMap
    vecs.foreach { case (id, v) =>
      (0 until 16).foreach { j =>
        var acc = 0.0
        (0 until dim).foreach(d => acc += v(d) * planeSign(j, d, dim, 11L))
        assert(got(id)(j) == acc / 8.0, s"id=$id j=$j")
      }
    }
  }

  test("seeds beyond the hashMod2 overflow bound are rejected") {
    // the driver-side plane hash replicates hashMod2 arithmetic: a
    // seed past 6e10 would overflow (k % Prime) * (Mult + seed) in
    // Long, flip h negative, and bias every plane to +1 — the same
    // require hashMod2 enforces must guard here
    val df = Seq((1L, Seq.fill(8)(1.0))).toDF("id", "v")
    intercept[IllegalArgumentException] {
      df.select(Similarity.randomProject(col("v"), 4, 8,
        seed = 60000000001L))
    }
    intercept[IllegalArgumentException] {
      df.select(Similarity.randomProject(col("v"), 4, 8, seed = -1L))
    }
  }

  test("signs are balanced and seeds decorrelate the planes") {
    val signs = for { j <- 0 until 16; d <- 0 until 64 }
      yield planeSign(j, d, 64, 11L)
    val plus = signs.count(_ > 0)
    assert(plus > 400 && plus < 624) // ~half of 1024
    val other = for { j <- 0 until 16; d <- 0 until 64 }
      yield planeSign(j, d, 64, 12L)
    assert(signs.zip(other).count { case (a, b) => a != b } > 300)
  }

  test("JL in practice: projected distances track true distances") {
    // 40 hash-derived unit-ish vectors; compare pairwise dot orderings
    // before and after 64 -> 16 reduction on a sample of pairs
    def vec(s: Long): Seq[Double] =
      (0 until 64).map(i => math.sin(s * 31.0 + i * 7.0))
    val rows = (1L to 40L).map(i => (i, vec(i)))
    val df = rows.toDF("id", "v")
      .select(col("id"),
        Similarity.randomProject(col("v"), 16, 64, seed = 3L).as("p"))
      .as[(Long, Seq[Double])].collect().toMap
    def dot(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    val byId = rows.toMap
    // scaled projected dot approximates the true dot: dot(v,w) ~
    // (64/16) * dot(pv, pw) after the /sqrt(64) scaling
    val errs = for { a <- 1L to 20L; b <- (a + 1) to 20L } yield {
      val t = dot(byId(a), byId(b))
      val p = dot(df(a), df(b)) * 4.0
      math.abs(t - p)
    }
    val norms = (1L to 20L).map(i => dot(byId(i), byId(i)))
    // mean absolute error well under the typical vector norm (16
    // planes -> sizable per-pair variance; the estimator is unbiased)
    assert(errs.sum / errs.size < norms.sum / norms.size * 0.75)
  }
}
