package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class RepetitionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def metrics(texts: String*): Seq[(String, Double, Double, Double)] = {
    texts.toDF("text")
      .select(col("text"), length(col("text")).as("tlen"),
        TextOps.tokens(col("text")).as("toks"))
      .select(col("text"),
        TextOps.dupTokenFrac(col("toks")).as("dup"),
        TextOps.topNgramCharFrac(col("toks"), col("tlen"), 2).as("top2"),
        TextOps.dupNgramFrac(col("toks"), 5).as("dup5"))
      .as[(String, Double, Double, Double)].collect().toSeq
  }

  test("all-unique doc scores zero on every repetition axis") {
    val Seq((_, dup, top2, dup5)) = metrics("a b c d e f")
    assert(dup == 0.0)
    // every bigram occurs once: best = 1 * len("a b") = 3 over 11 chars
    assert(top2 == 3.0 / 11)
    assert(dup5 == 0.0)
  }

  test("fully-repeated doc maxes the duplicate-token fraction") {
    val Seq((_, dup, top2, dup5)) = metrics("x x x x x x")
    assert(dup == 5.0 / 6)
    // "x x" occurs 5 times, len 3 -> 15 chars vs 11 total: frac > 1 is
    // expected for overlapping grams (Gopher's definition, unclamped)
    assert(top2 == 15.0 / 11)
    assert(dup5 == 0.5)
  }

  test("docs shorter than n yield zero n-gram metrics, not errors") {
    val Seq((_, dup, top2, dup5)) = metrics("solo")
    assert(dup == 0.0 && top2 == 0.0 && dup5 == 0.0)
  }

  test("ngrams is empty below n and windowed above") {
    val got = Seq("a b c").toDF("text")
      .select(TextOps.tokens(col("text")).as("toks"))
      .select(TextOps.ngrams(col("toks"), 2).as("g2"),
        TextOps.ngrams(col("toks"), 3).as("g3"))
      .as[(Seq[String], Seq[String])].head()
    assert(got._1 == Seq("a b", "b c"))
    assert(got._2 == Seq("a b c"))
  }
}
