package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class WinnowSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def fp(text: String, k: Int = 4, w: Int = 4) =
    Winnow.fingerprints(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text", k, w)
      .select("pos", "fp").as[(Int, Long)].collect().sortBy(_._1)

  test("the guarantee: any shared run of >= w+k-1 tokens shares a fingerprint") {
    // two docs sharing a 7-token run (w+k-1 = 7) amid distinct noise
    val shared = "alpha beta gamma delta epsilon zeta eta"
    val docs = Seq(
      (1L, s"one two three four five $shared aaa bbb ccc ddd"),
      (2L, s"xx yy zz ww $shared qq rr ss tt uu")
    ).toDF("doc_id", "text")
    val sets = Winnow.fingerprints(docs, "doc_id", "text", 4, 4)
      .select("doc_id", "fp").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((sets(1L) & sets(2L)).nonEmpty,
      "a w+k-1 shared run must yield a shared fingerprint")
  }

  test("every fingerprint is a window minimum; density ~2/(w+1)") {
    val toks = (0 until 200).map(i => s"t${(i * 7919) % 97}")
    val out = fp(toks.mkString(" "))
    // positions are valid gram indices and strictly informative
    assert(out.forall { case (p, _) => p >= 0 && p <= 196 })
    // winnowing selects one per window, dedup across windows:
    // expected density 2/(w+1) = 0.4; allow generous slack
    assert(out.length >= 197 / 4 && out.length <= 197)
  }

  test("short docs degrade to one whole-doc window; sub-k docs emit none") {
    // 5 tokens -> 2 grams < w -> single clamped window -> 1 fingerprint
    assert(fp("a b c d e").length == 1)
    assert(fp("a b c").isEmpty) // < k tokens: no grams at all
  }

  test("tie on the window minimum picks the RIGHTMOST occurrence") {
    // identical grams everywhere: all hashes equal, so every window's
    // min is its rightmost slot; distinct yields one pick per window
    val out = fp(Array.fill(10)("x").mkString(" "))
    // 7 grams, windows start 0..3 picking pos 3,4,5,6
    assert(out.map(_._1).toSeq == Seq(3, 4, 5, 6))
    assert(out.map(_._2).toSet.size == 1)
  }

  test("overlapPairs finds the planted near-dup and caps boilerplate buckets") {
    val base = (0 until 40).map(i => s"w${i}a w${i}b w${i}c w${i}d w${i}e")
    val docs = Seq(
      (1L, base.take(8).mkString(" ")),
      (2L, base.take(8).mkString(" ")), // exact dup of 1
      (3L, base.drop(20).take(8).mkString(" "))
    ).toDF("doc_id", "text")
    val pairs = Winnow.overlapPairs(docs, "doc_id", "text",
        k = 4, w = 4, minShared = 2)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
    // cap = 2 with a fingerprint shared by 3 docs: bucket dropped,
    // pairs it alone witnessed disappear
    val tri = Seq((1L, "a b c d e f g"), (2L, "a b c d e f g"),
      (3L, "a b c d e f g")).toDF("doc_id", "text")
    val capped = Winnow.overlapPairs(tri, "doc_id", "text",
      k = 4, w = 4, minShared = 1, maxBucketSize = 2)
    assert(capped.count() == 0)
  }
}
