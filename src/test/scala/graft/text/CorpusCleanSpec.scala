package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class CorpusCleanSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("cleanCorpus gates on language, stop ratio, length; dedups keeping min id") {
    val en = "the cat sat on the mat and it is a fine day in town"   // 14 tokens
    val fr = "le chat est sur le tapis et la vie est une belle chose" // french markers
    val dry = "alpha beta gamma delta epsilon zeta eta theta iota kappa" // no stopwords
    val docs = Seq(
      (1L, en),     // keeper
      (2L, en),     // exact dup of 1 -> dropped
      (3L, fr),     // wrong language -> dropped
      (4L, dry),    // stop_ratio 0 -> dropped
      (5L, "the a"),// too short -> dropped
      (6L, "the sun is up and the sky is blue it is warm") // keeper, 11 tokens
    ).toDF("doc_id", "text")
    val out = CorpusClean.cleanCorpus(docs, "doc_id", "text",
      lang = "en", stopwords = Seq("the", "a", "of", "and", "in", "to", "is", "it"),
      minStopRatio = 0.1, minTokens = 5L, maxTokens = 100L)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 6L))
    assert(out(0).getAs[Long]("n_tokens") == 14L)
    assert(out(0).getAs[Double]("stop_ratio") > 0.1)
  }

  test("decontaminate drops exactly the train docs matching an eval fingerprint") {
    val train = Seq(
      (1L, "alpha beta gamma"),
      (2L, "delta epsilon zeta"),
      (3L, "eta theta iota"),
      (4L, "alpha beta gamma")   // same content as doc 1
    ).toDF("doc_id", "text")
    val evalSet = Seq((100L, "alpha beta gamma"), (101L, "unseen text here"))
      .toDF("doc_id", "text")
    val out = CorpusClean.decontaminate(train, evalSet, "text")
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(2L, 3L)) // both copies of the contaminated text gone
  }

  test("decontaminateBloom equals decontaminate, including null-text rows") {
    val train = Seq(
      (1L, "alpha beta gamma"),
      (2L, "delta epsilon zeta"),
      (3L, "eta theta iota"),
      (4L, "alpha beta gamma"),
      (5L, null.asInstanceOf[String]) // null fp: keep path on both variants
    ).toDF("doc_id", "text")
    val evalSet = Seq((100L, "alpha beta gamma"), (101L, "unseen text here"))
      .toDF("doc_id", "text")
    val exact = CorpusClean.decontaminate(train, evalSet, "text")
      .select("doc_id").as[Long].collect().toSet
    val bloom = CorpusClean.decontaminateBloom(train, evalSet, "text",
      expectedEvalDocs = 100L)
      .select("doc_id").as[Long].collect().toSet
    assert(exact == Set(2L, 3L, 5L))
    assert(bloom == exact)
  }

  test("decontaminateBloom with an EMPTY eval set keeps every train row") {
    val train = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val evalSet = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val bloom = CorpusClean.decontaminateBloom(train, evalSet, "text",
      expectedEvalDocs = 100L)
      .select("doc_id").as[Long].collect().toSet
    assert(bloom == Set(1L, 2L)) // NULL sketch probes false -> keep path
  }

  test("surprisalDecileFilter ranks rare-token docs into the worst decile") {
    import org.apache.spark.sql.functions.col
    val spark2 = graft.TestSpark.spark
    import spark2.implicits._
    // 10 docs of common filler; doc 99 is all rare tokens -> highest
    // mean surprisal -> decile 10 -> dropped
    val docs = ((1L to 10L).map(i => (i, "the quick fox the quick fox")) :+
      (99L, "zyzzyva qwertyuiop")).toDF("doc_id", "text")
    val out = CorpusClean.surprisalDecileFilter(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("decile"), r.getAs[Boolean]("keep"))).toMap
    assert(out(99L)._1 == 10L && !out(99L)._2)
    assert((1L to 10L).forall(i => out(i)._2))
    // deciles partition 11 docs as floor ranks: rank r -> 1+(10(r-1) div 11)
    val deciles = out.values.map(_._1).toSeq.sorted
    assert(deciles == (1L to 11L).map(r => 1L + 10L * (r - 1) / 11L).sorted)
  }

  test("overlapReport grades partial contamination in exact ppm") {
    val spark2 = graft.TestSpark.spark
    import spark2.implicits._
    val train = Seq(
      (1L, "a b c d"),        // shingles {abc, bcd}: bcd is in eval -> 1/2
      (2L, "p q r"),          // {pqr}: untouched -> 0
      (3L, "x b c d y"),      // {xbc, bcd, cdy}: bcd -> 1/3
      (4L, "a b")             // < 3 tokens: no evidence, absent
    ).toDF("doc_id", "text")
    val evalDf = Seq((100L, "z b c d z")).toDF("doc_id", "text")
    val out = CorpusClean.overlapReport(train, evalDf, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((2L, 1L, 500000L)))
    assert(out(2L) == ((1L, 0L, 0L)))
    assert(out(3L) == ((3L, 1L, 333333L)))
    assert(!out.contains(4L), "sub-shingle docs carry no overlap evidence")
    // an eval doc repeating a shingle still counts each train shingle once
    val evalDup = Seq((100L, "b c d b c d")).toDF("doc_id", "text")
    val again = CorpusClean.overlapReport(train, evalDup, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(again(1L) == 1L, "distinct-shingle semantics on both sides")
  }
}
