package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class VocabSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "a a b"),
    (2L, "a b c"),
    (3L, "c c c d")
  ).toDF("doc_id", "text")

  test("vocab counts occurrences and document frequency") {
    val got = Vocab.vocab(docs, "doc_id", "text")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(
      "a" -> ((3L, 2L)), "b" -> ((2L, 2L)), "c" -> ((4L, 2L)), "d" -> ((1L, 1L))))
  }

  test("topTfidfTerm picks the rarest-weighted term per doc, ties on token order") {
    val got = Vocab.topTfidfTerm(docs, "doc_id", "text")
      .as[(Long, String, Long, Double)].collect()
      .map(r => r._1 -> r._2).toMap
    // doc 1: "a" tf=2 df=2 beats "b" tf=1; doc 3: "d" (df=1, ln3) beats
    // "c" tf=3 df=2 (3*ln1.5 ≈ 1.216 > ln3 ≈ 1.099) -> "c" wins
    assert(got(1L) == "a")
    assert(got(3L) == "c")
    // doc 2: all tf=1; "c" and "a","b" share df=2 -> scores tie at
    // ln(3/2); tiebreak is token ascending -> "a"
    assert(got(2L) == "a")
  }
}
