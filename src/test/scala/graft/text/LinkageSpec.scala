package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.JaroWinkler

class LinkageSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("jw matches the published reference values (DuckDB-verified)") {
    // values cross-checked against duckdb jaro_winkler_similarity
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),
      ("dixon", "dicksonx", 0.8133333333333332),
      ("jellyfish", "smellyfish", 0.8962962962962964),
      ("dwayne", "duane", 0.8400000000000001),
      ("crate", "trace", 0.7333333333333334),
      ("arnab", "raanb", 0.8666666666666667),
      ("abcd", "abce", 0.8833333333333334),
      ("ab", "ax", 0.6666666666666666), // prefix boost NOT applied <= 0.7
      ("ab", "ba", 0.0), // window 0: swapped chars don't match
      ("", "abc", 0.0),
      ("", "", 0.0), // DuckDB convention (not the libraries' 1.0)
      ("abc", "abc", 1.0))
    cases.foreach { case (a, b, exp) =>
      assert(JaroWinkler.jw(a, b) == exp, s"jw($a, $b)")
    }
    // codegen path produces the same doubles as the scala impl
    val df = cases.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .select(JaroWinkler.of(col("a"), col("b")).as("jw"))
    assert(df.collect().map(_.getDouble(0)).toSeq ==
      cases.map(_._3))
    // symmetry
    assert(JaroWinkler.jw("dixon", "dicksonx") ==
      JaroWinkler.jw("dicksonx", "dixon"))
  }

  test("fuzzyLink recovers the clean form of corrupted strings") {
    val master = Seq("filter", "stream", "window", "column", "batch")
      .toDF("w")
    val dirty = Seq("flter", "stram", "wndow", "clumn", "btch", "zzz")
      .toDF("q")
    val out = Linkage.fuzzyLink(dirty, master, "q", "w",
      minJw = 0.8, lenBand = 2, topK = 1)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("flter" -> "filter", "stram" -> "stream",
      "wndow" -> "window", "clumn" -> "column", "btch" -> "batch"))
    // zzz shares no block with any master word → unmatched, absent
  }

  test("blocking prunes cross-block pairs; plan stays an equi-join") {
    val master = (1 to 500).map(i => f"name$i%03d").toDF("w")
    val dirty = Seq("nme001", "xyz").toDF("q")
    val out = Linkage.fuzzyLink(dirty, master, "q", "w",
      minJw = 0.5, lenBand = 2, topK = 3)
    out.collect()
    graft.audit.PlanGuard.assertNoCartesian(out)
    graft.audit.PlanGuard.assertMaxExchanges(out, 4)
  }

  test("sortedNeighborhoodPairs catches first-char-divergent near-dups") {
    val master = Seq("klmno", "abcde", "zzz").toDF("w")
    // "lkmno" starts with a different char than its source "klmno" —
    // first-char blocking can never pair them; sorted neighbors can
    val dirty = Seq("lkmno", "abcdx").toDF("q")
    val out = Linkage.sortedNeighborhoodPairs(dirty, master, "q", "w",
      windowSize = 4, minJw = 0.5)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out.contains(("abcdx", "abcde")))
    assert(out.contains(("lkmno", "klmno")))
    assert(!out.exists(_._2 == "zzz"))
    // and the key-blocked path indeed misses the transposed pair
    val blocked = Linkage.fuzzyLink(dirty, master, "q", "w",
      minJw = 0.5, lenBand = 2, topK = 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(!blocked.contains(("lkmno", "klmno")))
  }
}
