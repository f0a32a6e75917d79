package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class NfcNormalizeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // explicit escape sequences throughout — pasted glyphs would let an
  // editor silently re-compose the decomposed fixtures
  private val composed = "caf\u00E9"      // é as one code point
  private val decomposed = "cafe\u0301"   // e + combining acute

  test("composed and decomposed spellings converge to identical bytes") {
    assert(composed != decomposed) // different before NFC
    val out = Seq((1L, composed), (2L, decomposed)).toDF("id", "t")
      .select(col("id"), NfcNormalize.of(col("t")).as("n"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == out(2L))
    assert(out(1L) == composed, "NFC canonical form is the composed one")
  }

  test("ASCII fast path is identity; nulls stay null") {
    val out = Seq((1L, Some("plain ascii")), (2L, Option.empty[String]))
      .toDF("id", "t")
      .select(col("id"), NfcNormalize.of(col("t")).as("n"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L).contains("plain ascii"))
    assert(out(2L).isEmpty)
  }

  test("unicodeScrub converges NFC forms, drops invisibles and controls") {
    val docs = Seq(
      (1L, composed), (2L, decomposed),                    // NFC converges
      (3L, "zero\u200Bwidth\u200B\u200C\u200D\uFEFF"),           // invisibles out
      (4L, "a\u0007b\u0000\u001Fc"),                       // controls out
      (5L, "keep\ttabs\nand\rreturns")                     // whitespace kept
    ).toDF("id", "t")
      .select(col("id"), graft.text.TextOps.unicodeScrub(col("t")).as("c"))
      .as[(Long, String)].collect().toMap
    assert(docs(1L) == docs(2L))
    assert(docs(3L) == "zerowidth")
    assert(docs(4L) == "abc")
    assert(docs(5L) == "keep\ttabs\nand\rreturns")
  }
}
