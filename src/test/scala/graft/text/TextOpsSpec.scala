package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class TextOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String) =
    Seq(text).toDF("t").select(c.as("r")).collect().head

  test("tokenCount and avgWordLen") {
    assert(one(TextOps.tokenCount(col("t")), "a bb ccc").getLong(0) == 3L)
    assert(one(TextOps.avgWordLen(col("t")), "a bb ccc").getDouble(0) == 2.0)
  }

  test("tokens split on runs of ANY whitespace, matching the oracle regex") {
    // Every oracle tokenizes with regexp_split_to_array(text, '\s+');
    // the engine uses split(text, "\\s+"). This fixture holds the messy
    // cases the generated (single-spaced) corpus never exercises — tabs,
    // newlines, CR, double spaces, a leading separator — and pins the
    // exact token vector both regexes produce, so a corpus change can't
    // silently diverge engine from oracle. Java \s == [ \t\n\x0B\f\r]
    // == RE2 [[:space:]], and both engines keep leading/trailing empty
    // fields at limit -1, so the vectors are identical by construction.
    val messy = "a  b\tc\nd\r\ne \t f"
    assert(one(TextOps.tokens(col("t")), messy).getSeq[String](0) ==
      Seq("a", "b", "c", "d", "e", "f"))
    assert(one(TextOps.tokenCount(col("t")), messy).getLong(0) == 6L)
    // leading whitespace yields a leading empty token in BOTH engines
    // (regex split keeps the empty field before a leading separator)
    assert(one(TextOps.tokens(col("t")), " x y").getSeq[String](0) ==
      Seq("", "x", "y"))
  }

  test("hitCount / wordRatio / longWordCount") {
    val text = "the quick the lazy elephant"
    assert(one(TextOps.hitCount(col("t"), Seq("the")), text).getLong(0) == 2L)
    assert(one(TextOps.wordRatio(col("t"), Seq("the")), text).getDouble(0) == 0.4)
    assert(one(TextOps.longWordCount(col("t"), 5), text).getLong(0) == 1L)
  }

  test("punctRatio counts punctuation density") {
    assert(one(TextOps.punctRatio(col("t")), "ab.!").getDouble(0) == 0.5)
  }

  test("shingles: n-grams of tokens; short docs collapse to one shingle") {
    val sh = one(TextOps.shingles(TextOps.tokens(col("t")), 3), "a b c d")
      .getSeq[String](0)
    assert(sh == Seq("a b c", "b c d"))
    val short = one(TextOps.shingles(TextOps.tokens(col("t")), 3), "a b")
      .getSeq[String](0)
    assert(short == Seq("a b"))
  }

  test("fingerprint: deterministic, order-sensitive rolling hash") {
    val f1 = one(TextOps.fingerprint(col("t")), "ab c").getLong(0)
    val f1b = one(TextOps.fingerprint(col("t")), "ab c").getLong(0)
    val f2 = one(TextOps.fingerprint(col("t")), "ba c").getLong(0)
    assert(f1 == f1b && f1 != f2)
    // hand-rolled expectation for "ab": ((0*31+97)%M)*31+98 % M
    val exp = (97L * 31 + 98) % 1000000007L
    assert(one(TextOps.fingerprint(col("t")), "ab").getLong(0) == exp)
  }

  test("langId: argmax with deterministic tie order") {
    val df = Seq("the cat and the hat", "le chat et les chats", "zzz qqq")
      .toDF("text")
    val out = df.select((col("text") +: TextOps.langScores(col("text"))): _*)
      .withColumn("predicted_lang", TextOps.langIdFromScores)
      .select("predicted_lang").as[String].collect()
    assert(out(0) == "en")
    assert(out(1) == "fr")
    assert(out(2) == "en") // all-zero scores: first lang in priority order
  }

  test("roughTokens splits off punctuation") {
    val toks = one(TextOps.roughTokens(col("t")), "hi, there!").getSeq[String](0)
    assert(toks == Seq("hi", ",", "there", "!"))
  }
}
