package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the exact-anti-join vs Bloom-prefilter crossover for
  * benchmark decontamination ([[graft.text.CorpusClean.decontaminate]]
  * vs [[graft.text.CorpusClean.decontaminateBloom]]).
  *
  * The two cost profiles: the exact anti join hash-joins every training
  * row against the full eval fingerprint set — free while that set
  * broadcasts (a few MB), but once it outgrows the broadcast threshold
  * the join falls back to a shuffle and the ENTIRE training corpus
  * pays an exchange. The Bloom path aggregates the eval set into a
  * bits-per-doc sketch, keeps probe-negative training rows (the
  * overwhelming majority) with no join at all, and sends only sketch
  * false-positives plus true hits through the exact anti join — so the
  * training side never shuffles regardless of eval size. The crossover
  * is therefore controlled by the EVAL size, not the train size.
  *
  * Corpus construction: sf documents blown up by a cross join with a
  * replica index appended to the text, so every replica is a distinct
  * fingerprint; eval replicas overlap the tail of the train replica
  * range, giving a real contaminated fraction. Run:
  * `sbt 'runMain graft.BloomBench'` (env SPARK_GRAFT_SF_DIR to change
  * scale). Results recorded in COVERAGE.md.
  */
object BloomBench {
  private def blowup(docs: DataFrame, reps: Int, repOffset: Int): DataFrame =
    docs.crossJoin(
        docs.sparkSession.range(repOffset, repOffset + reps.toLong).toDF("rep"))
      .select((col("doc_id") * 10000L + col("rep")).as("doc_id"),
        concat(col("text"), lit(" rep"), col("rep")).as("text"))
      // the single-file parquet scan gives the nested-loop output ONE
      // partition — without this every fingerprint runs on one thread
      .repartition(docs.sparkSession.sparkContext.defaultParallelism,
        col("doc_id"))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.t(spark, sfDir, "documents").select("doc_id", "text")
    val base = docs.count() // 5000 at sf0.1
    val trainReps = 400     // 2M train rows at sf0.1
    // train replica ids [0, 400); eval tails overlap the last 40
    // train replicas -> 10% of each eval size is true contamination
    val train = blowup(docs, trainReps, 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    train.count()

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    println(f"| eval rows | train rows | exact s | bloom s |")
    println(f"|---|---|---|---|")
    for (evalReps <- Seq(5, 50, 200, 500)) {
      val evalSet = blowup(docs, evalReps, trainReps - 40)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val evalRows = evalSet.count()
      // noop write evaluates every column, matching graft.Bench
      val exactS = time(graft.text.CorpusClean.decontaminate(train, evalSet, "text")
        .write.format("noop").mode("overwrite").save())
      System.gc()
      val bloomS = time(graft.text.CorpusClean.decontaminateBloom(train, evalSet,
          "text", expectedEvalDocs = evalRows)
        .write.format("noop").mode("overwrite").save())
      System.gc()
      println(f"| ${evalRows}%,d | ${base * trainReps}%,d | $exactS%.2f | $bloomS%.2f |")
      evalSet.unpersist()
    }
    spark.stop()
  }
}
