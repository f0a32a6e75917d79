package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class DsirSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // target rows (tgt=true) use words {aa bb}; source-only rows use
  // {zz yy}; doc 5 mixes both
  private def docs = Seq(
    (1L, "aa bb aa", true),
    (2L, "aa aa", true),
    (3L, "zz yy zz", false),
    (4L, "yy yy zz", false),
    (5L, "aa zz", false)).toDF("doc_id", "text", "tgt")

  test("matches the brute-force hashed-bucket importance weights") {
    val out = Vocab.dsirScore(docs, "doc_id", "text",
      isTarget = col("tgt"), buckets = 61, topK = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap

    // brute force in Scala with the same hash chain
    def fp(tok: String): Long =
      tok.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
    def bucket(tok: String): Long =
      ((fp(tok) % 100000007L) * 2654435761L) % 61L
    val rows = docs.collect().map(r =>
      (r.getLong(0), r.getString(1).split("\\s+").toSeq, r.getBoolean(2)))
    val inst = rows.flatMap { case (id, toks, t) =>
      toks.map(tok => (id, bucket(tok), t)) }
    val sc = inst.groupBy(_._2).map { case (b, xs) => b -> xs.size }
    val tc = inst.groupBy(_._2).map { case (b, xs) =>
      b -> xs.count(_._3) }
    val ts = sc.values.sum.toLong
    val tt = tc.values.sum.toLong
    def w(b: Long): Double = {
      val num = (tc(b) + 1L) * (ts + 61L)
      val den = (sc(b) + 1L) * (tt + 61L)
      BigDecimal(math.log(num.toDouble / den.toDouble))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    rows.foreach { case (id, toks, _) =>
      // per-(doc,bucket) groups quantize n·w at DECIMAL(18,6), matching
      // the operator's dsum over the grouped term counts
      val exp = toks.groupBy(bucket).map { case (b, xs) =>
        BigDecimal(xs.size * w(b)).setScale(6,
          BigDecimal.RoundingMode.HALF_UP) }.sum.toDouble
      val (n, got, _) = out(id)
      assert(n == toks.size, s"doc $id token count")
      assert(math.abs(got - exp) < 1e-9, s"doc $id: got $got expected $exp")
    }

    // target-worded docs outrank source-worded docs; top-2 = docs 1,2
    assert(out(1L)._3 && out(2L)._3)
    assert(!out(3L)._3 && !out(4L)._3 && !out(5L)._3)
    assert(out(2L)._2 > out(5L)._2 && out(5L)._2 > out(3L)._2)
  }

  test("plan shape: bounded exchange budget, no cartesian") {
    // the lazy path (no persist) exposes the full plan: doc-key
    // repartition ×2 (the weight subtree sits under the broadcast
    // boundary, where AQE's exchange reuse does not reach — why the
    // default path persists tf instead), bucket-count agg, the
    // single-partition totals window, plus the distributed top-k
    // rank's two exchanges (rank-bucket count agg + hash-by-bucket
    // redistribution — bounded-size, the price of retiring the
    // no-partition row_number window over the per-document scores)
    val out = Vocab.dsirScore(docs, "doc_id", "text", col("tgt"),
      buckets = 61, topK = 2, persistInput = false)
    out.collect()
    graft.audit.PlanGuard.assertNoCartesian(out)
    graft.audit.PlanGuard.assertMaxExchanges(out, 7)
    // persisted default: single tokenize, cache feeds both passes
    val dflt = Vocab.dsirScore(docs, "doc_id", "text", col("tgt"),
      buckets = 61, topK = 2)
    assert(dflt.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L, 5L))
  }
}
