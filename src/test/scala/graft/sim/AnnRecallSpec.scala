package graft.sim

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class AnnRecallSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def vec(s: Long): Seq[Double] =
    (0 until 8).map(i => math.sin(s * 17.0 + i * 3.0))
  private val corpus = (1L to 30L).map(i => (i, vec(i))).toDF("id", "v")
  private val queries = corpus.filter(col("id") <= 2)

  test("bruteTopKL2 matches a driver-side fold-ordered replay, ties to lowest id") {
    val got = Similarity.bruteTopKL2(corpus, queries, "id", "v", 4)
      .as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    val data = (1L to 30L).map(i => i -> vec(i)).toMap
    def dist(a: Seq[Double], b: Seq[Double]): Double = {
      var acc = 0.0
      a.indices.foreach(i => acc += (a(i) - b(i)) * (a(i) - b(i)))
      acc
    }
    (1L to 2L).foreach { q =>
      val want = data.keys.filter(_ != q).toSeq
        .map(n => (dist(data(q), data(n)), n)).sorted.take(4).map(_._2)
      assert(got(q) == want, s"query $q")
    }
  }

  test("annRecall: identical lists score 1, disjoint 0, partial in between") {
    val exact = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 20L, 1), (2L, 21L, 2), (2L, 22L, 3))
      .toDF("query_id", "neighbor_id", "rnk")
    // q1: ann found 2 of 3 (ranks permuted — recall ignores rank);
    // q2: ann found none
    val ann = Seq((1L, 12L, 1), (1L, 10L, 2), (1L, 99L, 3),
      (2L, 30L, 1), (2L, 31L, 2), (2L, 32L, 3))
      .toDF("query_id", "neighbor_id", "rnk")
    val got = Similarity.annRecall(ann, exact)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 3L, 2L, 2.0 / 3)))
    assert(got(2L) == ((2L, 3L, 0L, 0.0)))
    val perfect = Similarity.annRecall(exact, exact)
      .as[(Long, Long, Long, Double)].collect()
    assert(perfect.forall(r => r._4 == 1.0))
  }

  test("IVFADC at nprobe = nlist recalls everything bruteTopKL2 finds") {
    // with every cell probed the ADC ranking still quantizes, but at
    // tiny scale with k=16 codes over 30 vectors the top-4 lists agree
    // enough to pin recall strictly above the disjoint floor — and the
    // operator wiring (same metric both sides) is what this asserts
    val coarse = Pq.pqTrain(corpus, "id", "v", m = 1, k = 8)
    val pqcb = Pq.pqTrain(corpus, "id", "v", m = 4, k = 16)
    val ann = Pq.ivfPqTopK(corpus, queries, "id", "v", coarse, pqcb,
      nprobe = 8, topK = 4)
    val exact = Similarity.bruteTopKL2(corpus, queries, "id", "v", 4)
    val got = Similarity.annRecall(ann, exact)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.length == 2)
    assert(got.forall(r => r._2 == 4L && r._4 >= 0.5))
  }
}
