package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class MinKSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("minKSurprisal keeps exactly the ceil(frac*n) rarest token instances") {
    // corpus: 'a' x16, 'b' x2, 'z' x2 over two docs (n_total = 20)
    // doc 1: a x8, b x2  (n = 10; m = ceil(2) = 2 -> the two b's)
    // doc 2: a x8, z x2  (n = 10; m = 2 -> the two z's)
    val docs = Seq(
      (1L, (Seq.fill(8)("a") ++ Seq.fill(2)("b")).mkString(" ")),
      (2L, (Seq.fill(8)("a") ++ Seq.fill(2)("z")).mkString(" "))
    ).toDF("doc_id", "text")
    val out = Vocab.minKSurprisal(docs, "doc_id", "text", frac = 0.2)
      .select("doc_id", "min_k_total", "k_tokens", "n_tokens")
      .as[(Long, Double, Long, Long)].collect().map(r => r._1 -> r).toMap
    // dsum casts each INSTANCE to DECIMAL(18,6) before summing
    val cB = BigDecimal(math.round(math.log(20.0 / 2) * 1e9), 9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val want = (cB * 2).toDouble
    assert(out(1L) == ((1L, want, 2L, 10L)))
    assert(out(2L) == ((2L, want, 2L, 10L)))
  }

  test("frac = 1 totals every instance") {
    // all six instances share n_tok = 2 -> c = round(ln(3), 9); the
    // per-doc total is 3 instance-rounded terms (NOTE: one decimal ulp
    // apart from unigramSurprisal's tf-grouped contrib rounding — the
    // instance ranking needs instance granularity)
    val docs = Seq((1L, "a a b"), (2L, "b c c")).toDF("doc_id", "text")
    val c = BigDecimal(math.round(math.log(3.0) * 1e9), 9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val want = (c * 3).toDouble
    val mink = Vocab.minKSurprisal(docs, "doc_id", "text", frac = 1.0)
      .select("doc_id", "min_k_total").as[(Long, Double)]
      .collect().toMap
    assert(mink == Map(1L -> want, 2L -> want))
  }

  test("the boundary rank among equal-surprisal ties is value-stable") {
    // doc of 5 distinct equal-frequency tokens: every instance has the
    // same surprisal, so ANY top-1 choice yields the same total
    val docs = Seq((1L, "p q r s t")).toDF("doc_id", "text")
    val one = Vocab.minKSurprisal(docs, "doc_id", "text", frac = 0.2)
      .select("min_k_total", "k_tokens").as[(Double, Long)].head()
    val c = BigDecimal(math.round(math.log(5.0) * 1e9), 9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(one == ((c, 1L)))
  }

  test("frac out of (0,1] is rejected") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Vocab.minKSurprisal(docs, "doc_id", "text", frac = 0.0)
    }
  }
}
