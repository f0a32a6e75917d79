package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.TestSpark

class PrefixIndexSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("two stateful batches == from-scratch recompute over the union") {
    val corpus = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val b1 = corpus.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val b2 = corpus.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
    val s0 = PrefixIndex.build(corpus, "doc_id", "text",
      threshold = 0.9, shingleN = 3)
    val (p1, s1) = PrefixIndex.deltaPairs(b1, s0, corpus,
      "doc_id", "text", threshold = 0.9, shingleN = 3)
    val (p2, _) = PrefixIndex.deltaPairs(b2, s1, corpus.unionByName(b1),
      "doc_id", "text", threshold = 0.9, shingleN = 3)
    val got1 = p1.select("id1", "id2", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val got2 = p2.select("id1", "id2", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val ids1 = b1.select("doc_id").as[Long].collect().toSet
    val ids2 = b2.select("doc_id").as[Long].collect().toSet
    val full = NearDup.prefixFilterPairs(
        corpus.unionByName(b1).unionByName(b2),
        "doc_id", "text", threshold = 0.9, shingleN = 3)
      .select("id1", "id2", "jaccard").as[(Long, Long, Double)]
      .collect().toSet
    // batch 1's delta: pairs with >=1 endpoint in b1, none in b2
    val want1 = full.filter(p => (ids1(p._1) || ids1(p._2)) &&
      !ids2(p._1) && !ids2(p._2))
    // batch 2's delta: pairs with >=1 endpoint in b2
    val want2 = full.filter(p => ids2(p._1) || ids2(p._2))
    assert(got1 == want1)
    assert(got2 == want2)
    assert(got1.nonEmpty && got2.nonEmpty) // planted re-identified dups
    // telescoping: base pairs + the two deltas tile the union exactly
    val basePairs = NearDup.prefixFilterPairs(corpus, "doc_id", "text",
        threshold = 0.9, shingleN = 3)
      .select("id1", "id2", "jaccard").as[(Long, Long, Double)]
      .collect().toSet
    assert(basePairs.union(got1).union(got2) == full)
  }

  test("grams unseen at build stay exact across batches (frozen order)") {
    val base = Seq(
      (1L, "alpha beta gamma delta epsilon alpha beta gamma delta epsilon"),
      (2L, "spark parquet shuffle partitions broadcast join skew salt"))
      .toDF("doc_id", "text")
    // batch 1 brings a doc of entirely build-unseen vocabulary plus a
    // dup of a base doc; batch 2 near-dups the NEW-vocab doc — the
    // pair exists only through grams whose frozen frequency is 0
    val newText = "zeta eta theta iota kappa lambda mu nu xi omicron pi rho"
    val b1 = Seq(
      (101L, newText),
      (102L, "alpha beta gamma delta epsilon alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val b2 = Seq((201L, newText)).toDF("doc_id", "text")
    val s0 = PrefixIndex.build(base, "doc_id", "text", threshold = 0.9)
    val (p1, s1) = PrefixIndex.deltaPairs(b1, s0, base, "doc_id", "text")
    val (p2, _) = PrefixIndex.deltaPairs(b2, s1, base.unionByName(b1),
      "doc_id", "text")
    assert(p1.select("id1", "id2").as[(Long, Long)].collect().toSet ==
      Set((1L, 102L)))
    assert(p2.select("id1", "id2", "jaccard").as[(Long, Long, Double)]
      .collect().toSet == Set((101L, 201L, 1.0)))
  }

  test("State survives a parquet round-trip; resumed index == in-session") {
    // the persisted-state lifecycle IS the operator's point: build,
    // write both tables, read them back in a "new deployment", and the
    // resumed index must behave identically to the in-session one —
    // same delta pairs, same post-batch state via applyDelta
    val corpus = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val batch = corpus.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val s0 = PrefixIndex.build(corpus, "doc_id", "text",
      threshold = 0.9, shingleN = 3)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_prefixindex_").toString
    try {
      s0.stats.write.parquet(s"$tmp/stats")
      s0.index.write.parquet(s"$tmp/index")
      val resumed = PrefixIndex.State(
        spark.read.parquet(s"$tmp/stats"),
        spark.read.parquet(s"$tmp/index"))
      val (pLive, sLive) = PrefixIndex.deltaPairs(batch, s0, corpus,
        "doc_id", "text", threshold = 0.9, shingleN = 3)
      val (pRes, sRes) = PrefixIndex.deltaPairs(batch, resumed, corpus,
        "doc_id", "text", threshold = 0.9, shingleN = 3)
      def pairSet(df: org.apache.spark.sql.DataFrame) =
        df.select("id1", "id2", "jaccard")
          .as[(Long, Long, Double)].collect().toSet
      assert(pairSet(pLive) == pairSet(pRes))
      assert(pairSet(pLive).nonEmpty)
      def statsSet(s: PrefixIndex.State) =
        s.stats.select("g", "__f", "__b")
          .as[(String, Long, Long)].collect().toSet
      def indexSet(s: PrefixIndex.State) =
        s.index.as[(Long, String)].collect()
          .groupBy(identity).view.mapValues(_.length).toMap
      assert(statsSet(sLive) == statsSet(sRes))
      assert(indexSet(sLive) == indexSet(sRes))
      // the deployment-facing transition: stagePrefixes + applyDelta on
      // the resumed state == deltaPairs' own returned state
      val staged = PrefixIndex.stagePrefixes(batch, resumed.stats,
        "doc_id", "text", threshold = 0.9, shingleN = 3)
      val applied = PrefixIndex.applyDelta(resumed, staged)
      assert(statsSet(applied) == statsSet(sLive))
      assert(indexSet(applied) == indexSet(sLive))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(tmp))
    }
  }

  test("bucket cap drops an over-occupied gram from BOTH sides") {
    val blob = "one two three four five six seven eight nine ten"
    val base = Seq(
      (1L, blob), (2L, blob), (3L, blob), // 3 index rows per blob gram
      (4L, "unrelated words entirely spark catalyst tungsten codegen rows"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (11L, blob), // pushes blob-gram occupancy to 4 > cap
      (12L, "unrelated words entirely spark catalyst tungsten codegen rows"))
      .toDF("doc_id", "text")
    val s0 = PrefixIndex.build(base, "doc_id", "text", threshold = 0.9)
    val (pairs, s1) = PrefixIndex.deltaPairs(batch, s0, base,
      "doc_id", "text", threshold = 0.9, shingleN = 3, maxBucketSize = 2)
    // blob dups are lost (documented cap trade); the small bucket's
    // pair still lands; occupancy accounting stays truthful
    assert(pairs.select("id1", "id2").as[(Long, Long)].collect().toSet ==
      Set((4L, 12L)))
    val idx0 = s0.index.count()
    val staged = PrefixIndex.stagePrefixes(batch, s0.stats,
      "doc_id", "text", threshold = 0.9).count()
    assert(s1.index.count() == idx0 + staged) // append-only, ALL rows kept
    // stats merge: occupancy == true index row count per gram
    val byStats = s1.stats.select("g", "__b").as[(String, Long)]
      .collect().toMap
    val byIndex = s1.index.groupBy("g").count()
      .as[(String, Long)].collect().toMap
    assert(byIndex.forall { case (g, n) => byStats(g) == n })
  }
}
