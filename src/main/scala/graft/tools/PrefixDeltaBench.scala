package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bench-only: the measurement q206 cannot make. The registered query
  * builds the PrefixIndex state AND runs one delta in the same timed
  * window, so its scaling decade measures the (deliberately
  * corpus-sized, once-per-rebuild) BUILD — not the claim that matters
  * at 100 TB, which is that a standing pipeline's PER-BATCH cost is
  * O(batch + touched buckets), independent of how big the corpus has
  * grown. This main builds the state UNTIMED, then times `deltaPairs`
  * alone on a FIXED-size incoming batch (default 2000 docs,
  * re-identified every-Nth sampling so planted dups guarantee real
  * candidate work), twice (min reported). Run it at soak zipf1 and
  * zipf10: a batch-shaped delta should cost ROUGHLY THE SAME at both
  * — a 10x delta would mean the state isn't doing its job.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=soak/zipf1 runMain
  * graft.tools.PrefixDeltaBench [batchDocs=2000]` — one
  * `PREFIX_DELTA` JSON line.
  */
object PrefixDeltaBench {

  def main(args: Array[String]): Unit = {
    val batchDocs = if (args.nonEmpty) args(0).toLong else 2000L
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .select("doc_id", "text")
    val n = docs.count()
    val every = math.max(n / batchDocs, 1L)
    val incoming = docs.filter(col("doc_id") % every === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
      .localCheckpoint(true) // batch staged; its cost is not the delta's
    // UNTIMED: the once-per-rebuild corpus-sized state construction
    val state = graft.dedup.PrefixIndex.build(docs, "doc_id", "text",
      threshold = 0.9, shingleN = 3)
    state.stats.count(); state.index.count() // settle the checkpoints
    def timedDelta(): Double = {
      val t0 = System.nanoTime()
      val (pairs, _) = graft.dedup.PrefixIndex.deltaPairs(incoming, state,
        docs, "doc_id", "text", threshold = 0.9, shingleN = 3)
      pairs.write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      // NO blanket unpersist here (unlike Bench's inter-query
      // hygiene): the standing state and the staged batch ARE
      // localCheckpoint blocks — dropping them destroys the state the
      // second sample needs (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND).
      spark.sharedState.cacheManager.clearCache()
      System.gc()
      secs
    }
    val s1 = timedDelta()
    val s2 = timedDelta()
    def dp3(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(s"""PREFIX_DELTA {"corpus_docs":$n,"batch_docs":${n / every},""" +
      s""""delta_secs":${dp3(math.min(s1, s2))},""" +
      s""""samples":[${dp3(s1)},${dp3(s2)}],"sf":"$sfDir"}""")
    spark.stop()
  }
}
