package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class NearDupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again"
  private def docs = Seq(
    (1L, base),
    (2L, base),                                  // exact dup of 1
    (3L, base.replace("quick", "rapid")),        // near dup of 1
    (4L, "completely different words about spark shuffles and parquet files")
  ).toDF("doc_id", "text")

  test("identical texts get identical minhash signatures") {
    val sigs = NearDup.minhashSignatures(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(4L))
    assert(sigs(1L).length == 64)
  }

  test("nearDupPairs finds exact and near duplicates, not unrelated docs") {
    val pairs = NearDup.nearDupPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    // exact dup pair has jaccard 1.0
    val j = NearDup.nearDupPairs(docs, "doc_id", "text", threshold = 0.5)
      .filter($"id1" === 1 && $"id2" === 2).select("jaccard")
      .as[Double].collect().head
    assert(j == 1.0)
  }

  test("simhash: identical docs have hamming 0; near dups small hamming") {
    val sigs = NearDup.simhash(docs, "doc_id", "text")
    val m = sigs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == m(2L))
    assert(java.lang.Long.bitCount(m(1L) ^ m(3L)) <= 16)
    val pairs = NearDup.simhashPairs(sigs, "doc_id", maxHamming = 16, blocks = 8)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("jaccardVerify computes exact token-set jaccard") {
    val pairs = Seq((1L, 4L)).toDF("id1", "id2")
    val j = NearDup.jaccardVerify(pairs, docs, "doc_id", "text")
      .select("jaccard").as[Double].collect().head
    assert(j >= 0.0 && j < 0.2)
  }
}
