package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class GopherRulesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val stops = Seq("the", "a")

  test("gopherSignals: exact integer signals on hand fixtures") {
    val docs = Seq(
      (1L, "aa bb cc"),            // chars 6 / 3 tokens -> 2,000,000 ppm
      (2L, "ab 12 cd"),            // alpha 2/3 -> 666,666 ppm (floor)
      (3L, "the the a")            // stop instances counted, not types
    ).toDF("doc_id", "text")
    val got = GopherRules.gopherSignals(docs, "doc_id", "text", stops)
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) == ((3L, 2000000L, 1000000L, 0L)))
    assert(got(2L) == ((3L, 2000000L, 666666L, 0L)))
    assert(got(3L) == ((3L, 2333333L, 1000000L, 3L)))
  }

  test("gopherSignals: keep verdict applies every gate") {
    // 60 tokens, mean len in range, all alpha, two stop hits -> keep
    val goodText = ("the a " + Seq.fill(58)("word").mkString(" "))
    val docs = Seq(
      (1L, goodText),
      (2L, Seq.fill(60)("word").mkString(" ")),    // no stop hits
      (3L, "the a word"),                          // too short
      (4L, "the a " + Seq.fill(58)("xy").mkString(" ")) // mean len < 3
    ).toDF("doc_id", "text")
    val keep = GopherRules.gopherSignals(docs, "doc_id", "text", stops)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(keep == Map(1L -> true, 2L -> false, 3L -> false, 4L -> false))
  }

  test("repetitionSignals: hand-checked ppm on a stuck phrase") {
    val docs = Seq(
      // bigrams: "x y" x2, "y x" x2 -> top 2/4 = 500000 ppm;
      // trigrams: "x y x" x2, "y x y" x1 -> dup 2/3 = 666666 ppm
      (1L, "x y x y x"),
      // all bigrams/trigrams distinct -> top 1/4 = 250000, dup 0
      (2L, "a b c d e"),
      (3L, "one two")              // < 3 tokens: dropped
    ).toDF("doc_id", "text")
    val got = GopherRules.repetitionSignals(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) == ((5L, 500000L, 666666L, false)))
    assert(got(2L) == ((5L, 250000L, 0L, false)))
    assert(!got.contains(3L))
    // loosened thresholds flip the diverse doc to keep
    val loose = GopherRules.repetitionSignals(docs, "doc_id", "text",
        maxTopBigramPpm = 250000L, maxDupTrigramPpm = 0L)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(loose == Map(1L -> false, 2L -> true))
  }

  test("repetitionSignals is layout-independent") {
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val a = GopherRules.repetitionSignals(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSet
    val b = GopherRules.repetitionSignals(docs.repartition(13),
        "doc_id", "text")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSet
    assert(a == b && a.nonEmpty)
  }
}
