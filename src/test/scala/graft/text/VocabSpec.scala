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

  test("lexicalDiversity: TTR and hapax fraction from hand counts") {
    import org.apache.spark.sql.functions.col
    val src = Seq(
      ("spam", "buy buy buy now"),      // 4 tokens, 2 types, 1 hapax
      ("spam", "buy now now"),          // group totals: 7 tok, 2 types
      ("text", "one two three two")     // 4 tokens, 3 types, 2 hapax
    ).toDF("source", "text")
    val got = Vocab.lexicalDiversity(src, col("source"), "text")
      .as[(String, Long, Long, Double, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("spam") == (("spam", 7L, 2L, 2.0 / 7, 0L, 0.0)))
    assert(got("text") == (("text", 4L, 3L, 3.0 / 4, 2L, 2.0 / 3)))
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
      .map(r => r._1 -> ((r._2 / r._3, r._3))).toMap // mean = total / n
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

  test("bpeTrain learns the hand-computed merge sequence; greedy overlap") {
    // words: aaab x2, ab x1
    // round 1: (a,a)=4 (two per 'aaab'), (a,b)=3 -> merge (a,a)
    //   greedy left-to-right: 'aaab' -> [aa, a, b] (no overlap re-fuse)
    // round 2: (aa,a)=2, (a,b)=3 -> merge (a,b)
    // round 3: 'aaab' -> [aa, ab]; (aa,ab)=2 -> merge (aa,ab)
    val docs = Seq((1L, "aaab aaab"), (2L, "ab")).toDF("doc_id", "text")
    val got = Vocab.bpeTrain(docs, "doc_id", "text", 3)
      .orderBy("step").as[(Int, String, String, Long)].collect().toSeq
    assert(got == Seq((1, "a", "a", 4L), (2, "a", "b", 3L), (3, "aa", "ab", 2L)))
  }

  test("bpeTrain is layout-independent; stops when no adjacency remains") {
    val docs = Seq((1L, "aaab aaab"), (2L, "ab")).toDF("doc_id", "text")
    val a = Vocab.bpeTrain(docs, "doc_id", "text", 2)
      .as[(Int, String, String, Long)].collect().toSet
    val b = Vocab.bpeTrain(docs.repartition(7), "doc_id", "text", 2)
      .as[(Int, String, String, Long)].collect().toSet
    assert(a == b)
    // single-char corpus: zero adjacencies, zero merges, no crash
    val single = Seq((1L, "a a a")).toDF("doc_id", "text")
    assert(Vocab.bpeTrain(single, "doc_id", "text", 5).collect().isEmpty)
  }

  test("bpeSegmentCounts applies merges in rank order over instances") {
    val docs = Seq((1L, "aaab aaab"), (2L, "ab")).toDF("doc_id", "text")
    // after (a,a) then (a,b): 'aaab' -> [aa, ab], 'ab' -> [ab]
    val got = Vocab.bpeSegmentCounts(docs, "text", Seq(("a", "a"), ("a", "b")))
      .as[(String, Long)].collect().toMap
    assert(got == Map("aa" -> 2L, "ab" -> 3L))
  }

  test("knBigramLm matches the hand-computed smoothed probabilities") {
    // bigrams: (a,b)x2 from 'a b a b', (b,a)x2 (one in-doc, one from 'b a')
    // c1(a)=2, c1(b)=2, n1p=1 each, nctx=1 each, types=2
    // P = (2-0.75)/2 + 0.75*1/2*(1/2) = 0.625 + 0.1875 = 0.8125
    val docs = Seq((1L, "a b a b"), (2L, "b a")).toDF("doc_id", "text")
    val got = Vocab.knBigramLm(docs, "doc_id", "text")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got == Map(("a", "b") -> ((2L, 0.8125)), ("b", "a") -> ((2L, 0.8125))))
  }

  test("knSurprisal scores improbable bigram order above conforming docs") {
    val docs = (1L to 20L).map(i => (i, "x y x y x y"))
      .toDF("doc_id", "text")
      .unionByName(Seq((100L, "y y x x")).toDF("doc_id", "text"))
    val got = Vocab.knSurprisal(docs, "doc_id", "text")
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> r._2 / r._3).toMap // mean = total / n, downstream
    // the scrambled doc's (y,y)/(x,x) bigrams are corpus-rare
    assert(got(100L) > got(1L))
    // conforming docs all score identically
    assert((1L to 20L).map(got).toSet.size == 1)
    // single-token docs drop out
    val short = Seq((1L, "a b"), (2L, "a")).toDF("doc_id", "text")
    assert(Vocab.knSurprisal(short, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet == Set(1L))
  }

  test("bm25Scores matches a hand computation; absent terms drop out") {
    // corpus: N=3, dl = 3, 3, 4, avgdl = 10/3
    // query {a, d, zzz}: df(a)=2, df(d)=1, zzz absent
    val k1 = 1.2; val b = 0.75
    val got = Vocab.bm25Scores(docs, "doc_id", "text", Seq("a", "d", "zzz"))
      .as[(Long, Double)].collect().toMap
    def idf(df: Int) = math.log((3.0 - df + 0.5) / (df + 0.5) + 1.0)
    def term(tf: Long, df: Int, dl: Long) =
      idf(df) * tf * (k1 + 1.0) /
        (tf + k1 * (1.0 - b + b * dl * 3.0 / 10.0))
    // doc1 "a a b": tf(a)=2; doc2 "a b c": tf(a)=1; doc3 "c c c d": tf(d)=1
    assert(math.abs(got(1L) - term(2, 2, 3)) < 1e-6)
    assert(math.abs(got(2L) - term(1, 2, 3)) < 1e-6)
    assert(math.abs(got(3L) - term(1, 1, 4)) < 1e-6)
    // rarer term at equal tf outscores: doc3's d-hit beats doc2's a-hit
    assert(got(3L) > got(2L))
    // tf saturation: doubling tf (doc1 vs doc2) < doubling the score
    assert(got(1L) < 2 * got(2L) && got(1L) > got(2L))
  }

  test("bm25TopK is deterministic and k-bounded") {
    val big = (1L to 500L)
      .map(i => (i, if (i % 7 == 0) "a d x" else "a b c")).toDF("doc_id", "text")
    val top = Vocab.bm25TopK(big, "doc_id", "text", Seq("d"), k = 5)
      .as[(Long, Double)].collect()
    assert(top.length == 5)
    assert(top.map(_._1).toSeq == Seq(7L, 14L, 21L, 28L, 35L)) // ties -> id asc
    val again = Vocab.bm25TopK(big.repartition(17), "doc_id", "text",
      Seq("d"), k = 5).as[(Long, Double)].collect()
    assert(top.toSeq == again.toSeq)
  }

  test("oovRate against the corpus head vocabulary; cutoff ties on token asc") {
    // counts: a=3, d=2, b=1, c=1
    val docs = Seq((1L, "a a b c"), (2L, "a d d")).toDF("doc_id", "text")
    val v2 = Vocab.oovRate(docs, "doc_id", "text", vocabSize = 2)
      .select("doc_id", "n_tokens", "oov_tokens", "oov_frac")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // vocab {a, d}: doc1 misses b,c (2 of 4); doc2 fully covered
    assert(v2(1L) == ((1L, 4L, 2L, 0.5)))
    assert(v2(2L) == ((2L, 3L, 0L, 0.0)))
    // vocabSize=3: b and c tie at 1 — token asc admits b, so doc1
    // misses only c
    val v3 = Vocab.oovRate(docs, "doc_id", "text", vocabSize = 3)
      .select("doc_id", "oov_tokens").as[(Long, Long)].collect().toMap
    assert(v3 == Map(1L -> 1L, 2L -> 0L))
  }

  test("bpeFertilityByGroup: exact per-group piece and char sums") {
    // merge ("a","b"): "ab"->1 piece, "aba"->2 ("ab","a"), "cc"->2
    val df = Seq(
      ("en", "ab ab aba"), // words: ab×2 (1 piece, 2 chars), aba (2, 3)
      ("de", "cc ab")      // cc (2 pieces, 2 chars), ab (1, 2)
    ).toDF("lang", "text")
    val got = Vocab.bpeFertilityByGroup(df, "lang", "text",
        Seq(("a", "b")))
      .as[(String, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got("en") == ((3L, 4L, 7L, 4.0 / 3, 7.0 / 4)))
    assert(got("de") == ((2L, 3L, 4L, 3.0 / 2, 4.0 / 3)))
  }

  test("zipfFit: exact two-point log-log line has slope -1, r2 ~ 1") {
    import org.apache.spark.sql.functions.col
    // freq(a)=6 at rank 1, freq(b)=3 at rank 2: slope = -ln2/ln2 = -1
    val corpus = Seq((1L, "a a a b"), (2L, "a a a b b")).toDF("doc_id", "text")
    val Array(r) = Vocab.zipfFit(corpus, "doc_id", "text", topN = 10)
      .as[(Long, Option[Double], Option[Double], Option[Double])].collect()
    assert(r._1 == 2L)
    // the five OLS sums ride the DECIMAL(18,6) dsum grain: with only
    // two points the closing quotients amplify that 5e-7 per-sum grain
    // to ~1e-4 on slope/r2 — the boundary is grain-bounded, not exact
    assert(r._2.exists(sl => math.abs(sl + 1.0) < 1e-3))
    assert(r._4.exists(v => math.abs(v - 1.0) < 1e-3))
  }
}
