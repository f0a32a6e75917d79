package graft.sim

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SimilaritySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // 4-dim unit-ish vectors: 1 and 2 identical direction, 3 orthogonal
  private def emb = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Array(2.0f, 0.0f, 0.0f, 0.0f)),
    (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (4L, Array(0.7f, 0.7f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("bruteTopK ranks by exact cosine with deterministic tiebreak") {
    val out = Similarity.bruteTopK(emb, emb.filter($"vec_id" === 1), "vec_id",
        "embedding", 3)
      .orderBy("rnk").as[(Long, Long, Int)].collect()
    assert(out.map(_._2).toSeq == Seq(2L, 4L, 3L)) // cos: 1.0, ~0.707, 0.0
    assert(out.map(_._3).toSeq == Seq(1, 2, 3))
  }

  test("lshTopK finds the identical-direction vector") {
    val out = Similarity.lshTopK(emb, emb.filter($"vec_id" === 1), "vec_id",
        "embedding", k = 3, bits = 8, dim = 4)
      .as[(Long, Long, Int)].collect()
    assert(out.nonEmpty)
    assert(out.head._2 == 2L) // same bucket guaranteed: identical signs
  }

  test("cosineNearDupPairs: finds scale-invariant duplicates, never unrelated") {
    val withDup = emb.unionByName(
      Seq((10L, Array(3.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding"))
    val pairs = Similarity.cosineNearDupPairs(withDup, "vec_id", "embedding",
        threshold = 0.999, bits = 8, dim = 4, tables = 4)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))  // same direction
    assert(pairs.contains((1L, 10L)) && pairs.contains((2L, 10L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L)) // orthogonal
  }

  test("lshTopK agrees with brute force on clustered testdata sample") {
    val embeddings = graft.Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = embeddings.filter($"vec_id" < 3)
    val brute = Similarity.bruteTopK(embeddings, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(embeddings, queries, "vec_id", "embedding",
        k = 5, bits = 8, dim = 64, tables = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // approximate recall: some overlap with exact answers, never empty
    assert(approx.nonEmpty)
    assert((brute intersect approx).nonEmpty)
  }
}
