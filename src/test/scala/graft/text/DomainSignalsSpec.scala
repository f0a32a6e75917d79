package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class DomainSignalsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val stop = Seq("the", "a", "of", "and", "in", "to", "is", "it")

  test("per-domain doc/token/dup/quality rollup on a hand fixture") {
    // d2 and d4 share exact content ACROSS domains — both domains'
    // dup_docs must count them; d3 fails the minTokens=10 gate.
    val docs = Seq(
      (1L, "A", "the spark table joins the big table with a hash join"),
      (2L, "A", "the data stream scans the fast table with a sort merge"),
      (3L, "A", "tiny doc"),
      (4L, "B", "the data stream scans the fast table with a sort merge")
    ).toDF("doc_id", "domain", "text")
    val got = DomainSignals
      .domainSignals(docs, "domain", "doc_id", "text", stop, minTokens = 10)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    // A: 3 docs, 11+11+2 tokens, 1 dup (d2), 1 quality fail (d3)
    assert(got("A") == ((3L, 24L, 1L, 333333L, 1L, 333333L)))
    // B: the sole doc is a cross-domain duplicate, quality-clean
    assert(got("B") == ((1L, 11L, 1L, 1000000L, 0L, 0L)))
  }
}
