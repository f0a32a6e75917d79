package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Blocked fuzzy record linkage: match dirty strings against a clean
  * master list by Jaro-Winkler similarity — the classic entity-
  * resolution / typo-canonicalization pass (dedupe customer names,
  * normalize misspelled vocabulary, reconcile product titles).
  *
  * Scale shape: the all-pairs comparison is pruned by BLOCKING — only
  * pairs sharing a block key (default: first character) and within a
  * length band are scored, so the join is an equi-join whose fan-out is
  * block-bounded, never |queries|·|master|. At 100 TB, choose a block
  * key with bounded selectivity (phonetic code, prefix-2, sorted-
  * neighborhood key); a single hot block concentrates its whole
  * comparison space (the mega-bucket caveat — cap or salt it like
  * [[graft.dedup.NearDup]]'s bucket cap if the key can degenerate).
  *
  * Scoring is the native codegen'd [[graft.functions.JaroWinkler]]
  * (DuckDB-compatible conventions, so linkage output replays in SQL);
  * scores are rounded to 9 dp before the (score desc, match asc)
  * rank, making the top-k per query engine-deterministic.
  */
object Linkage {

  /** Top-k fuzzy matches per query string.
    *
    * @param blockKey blocking function (default: first character)
    * @param lenBand  max length difference inside a block
    * @param minJw    similarity floor (applied before ranking)
    */
  def fuzzyLink(queries: DataFrame, master: DataFrame, qCol: String,
                mCol: String, minJw: Double = 0.8, lenBand: Int = 2,
                topK: Int = 1,
                blockKey: Column => Column = substring(_, 1, 1))
      : DataFrame = {
    val q = queries.select(col(qCol).as("query"))
      .withColumn("__blk", blockKey(col("query")))
    val m = master.select(col(mCol).as("matched"))
      .withColumn("__blk", blockKey(col("matched")))
    val cand = q.join(m, Seq("__blk"))
      .filter(abs(length(col("query")) - length(col("matched")))
        <= lit(lenBand))
      .withColumn("jw",
        round(graft.functions.JaroWinkler.of(col("query"), col("matched")), 9))
      .filter(col("jw") >= lit(minJw))
    val w = Window.partitionBy("query")
      .orderBy(col("jw").desc, col("matched").asc)
    cand.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select("query", "matched", "jw", "rnk")
  }

  /** Sorted-neighborhood blocking (Hernández & Stolfo 1995) — the
    * other classic linkage candidate generator: merge both sources
    * into ONE globally sorted list and score only records within a
    * sliding window of `windowSize` positions. Where key blocking
    * misses pairs whose first characters differ ("klm" vs "lkm"),
    * sorted neighbors catch anything lexically close; the two
    * strategies are complementary and production linkage unions their
    * candidate sets.
    *
    * Pair generation is an EQUI-join: each row explodes to its
    * `windowSize - 1` forward offsets and joins on
    * `position + offset` — bounded fan-out, no range join. Global
    * positions come from [[graft.operators.Ranks.rowNumberKeyed]]
    * with the order-preserving 7-byte string prefix key: the universe
    * is bucketed by prefix, offsets are exact per-bucket prefix
    * counts, and each bucket sorts independently — a hash-distributed
    * plan that is bit-identical to the single-partition sort it
    * replaces and survives a billion-row universe. The ranked
    * universe feeds BOTH the offset explode and the position join, so
    * it is eagerly checkpointed (also guaranteeing one consistent
    * numbering across the two references).
    *
    * Determinism: positions come from the total order
    * (value asc, source asc); scores are 9 dp-rounded Jaro-Winkler.
    */
  def sortedNeighborhoodPairs(left: DataFrame, right: DataFrame,
                              lCol: String, rCol: String,
                              windowSize: Int = 4,
                              minJw: Double = 0.8): DataFrame = {
    require(windowSize >= 2, s"windowSize must be >= 2, got $windowSize")
    // Two eager checkpoints, each earning its barrier: the UNION
    // universe feeds Ranks' three internal reads (cuts sketch, bucket
    // counts, ranked join — the operator's caller contract; in q174
    // it is two distinct()s over exploded per-document tokens, so
    // re-deriving it 3× dominated the first wiring), and the RANKED
    // universe feeds both the offset explode and the position join —
    // checkpointing it also guarantees one consistent numbering
    // across those two references.
    val uni0 = left.select(col(lCol).as("value"), lit("L").as("src"))
      .unionByName(right.select(col(rCol).as("value"), lit("R").as("src")))
      .localCheckpoint(true)
    val uni = graft.operators.Ranks.rowNumberKeyed(uni0,
        graft.operators.Ranks.stringPrefixKey(col("value")),
        Seq(col("value").asc, col("src").asc), out = "__rn")
      .localCheckpoint(true)
    val offs = uni.select(col("value").as("v1"), col("src").as("s1"),
        col("__rn"),
        explode(sequence(lit(1), lit(windowSize - 1))).as("__o"))
      .select(col("v1"), col("s1"), (col("__rn") + col("__o")).as("__rn2"))
    offs.join(uni.select(col("value").as("v2"), col("src").as("s2"),
        col("__rn").as("__rn2")), Seq("__rn2"))
      .filter(col("s1") =!= col("s2"))
      .select(
        when(col("s1") === "L", col("v1")).otherwise(col("v2")).as("query"),
        when(col("s1") === "L", col("v2")).otherwise(col("v1")).as("matched"))
      .withColumn("jw",
        round(graft.functions.JaroWinkler.of(col("query"), col("matched")), 9))
      .filter(col("jw") >= lit(minJw))
      .distinct()
  }
}
