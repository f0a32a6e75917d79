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

  test("unigramSurprisal: rare-token docs score higher; weights sum right") {
    // corpus: 10 tokens total; p(a)=4/10, p(b)=2/10, p(c)=3/10, p(d)=1/10
    val sealedDocs = Seq(
      (1L, "a a a a"),   // all common -> low surprisal
      (2L, "d b b"),     // rare d -> higher
      (3L, "c c c")
    ).toDF("doc_id", "text")
    val got = Vocab.unigramSurprisal(sealedDocs, "doc_id", "text")
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L)._2 == 4L && got(2L)._2 == 3L && got(3L)._2 == 3L)
    val exp1 = math.log(10.0 / 4)                         // every token is a
    val exp2 = (math.log(10.0 / 1) + 2 * math.log(10.0 / 2)) / 3
    assert(math.abs(got(1L)._1 - exp1) < 1e-6)
    assert(math.abs(got(2L)._1 - exp2) < 1e-6)
    assert(got(2L)._1 > got(1L)._1)
  }

  test("sparseTfidfCosine matches a dense hand computation") {
    val pairs = Seq((1L, 2L)).toDF("id1", "id2")
    val out = Vocab.sparseTfidfCosine(pairs, docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
    assert(out.length == 1)
    // weights: w(t) = tf * ln(3/df); doc1 {a:2w_a, b:w_b}, doc2
    // {a:w_a, b:w_b, c:w_c} with w_a=w_b=w_c=ln(1.5)
    val w = math.log(3.0 / 2)
    val dot = 2 * w * w + w * w
    val cos = dot / (math.sqrt(4 * w * w + w * w) * math.sqrt(3 * w * w))
    assert(math.abs(out.head._3 - cos) < 1e-6)
  }

  test("sparseTfidfCosine drops pairs with no shared term") {
    val disjoint = Seq((1L, "x x"), (2L, "y z")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id1", "id2")
    assert(Vocab.sparseTfidfCosine(pairs, disjoint, "doc_id", "text").isEmpty)
  }
}
