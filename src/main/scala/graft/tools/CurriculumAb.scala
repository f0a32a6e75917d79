package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bench-only A/B for [[graft.operators.Sample.curriculumOrder]]'s
  * second pass (r14 verdict item 5): the LEGACY shape — a generic
  * [[graft.operators.Ranks.rowNumber]] over the composite
  * `(tier − 1)·10⁹ + hash` key, paying an `approx_percentile` sketch
  * read to discover a distribution that is already known — vs the
  * FUSED shape shipped in the operator, whose bucket id is a pure
  * projection of `(tier, hash)`. Asserts the two permutations are
  * IDENTICAL row-for-row before reporting times (the fuse is a plan
  * change, not a semantics change), then times each end-to-end
  * (min of 2, noop sink).
  *
  * Usage: `SPARK_GRAFT_SF_DIR=soak/zipf1 runMain
  * graft.tools.CurriculumAb` — prints one `CURRICULUM_AB` JSON line.
  */
object CurriculumAb {

  /** The pre-fuse shape, verbatim from the r14 tree: ntile, checkpoint,
    * generic rowNumber over the composite key.
    */
  private def legacy(df: DataFrame, idCol: String,
                     difficulty: org.apache.spark.sql.Column,
                     buckets: Int, epoch: Long): DataFrame = {
    val tiled = graft.operators.Ranks.ntile(
      df.withColumn("__diff", difficulty), buckets, "__diff",
      ascending = true, tiebreaks = Seq(idCol), out = "tier")
    val keyed = tiled.withColumn("__ck",
      (col("tier") - 1) * 1000000000L +
        graft.operators.Sample.hashMod2(col(idCol), 1000000000L, epoch))
      .localCheckpoint(true)
    graft.operators.Ranks.rowNumber(keyed, "__ck", ascending = true,
        tiebreaks = Seq(idCol), out = "train_pos")
      .drop("__diff", "__ck")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val in = graft.Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"),
        graft.text.TextOps.tokenCount(col("text")).as("n_tokens"))
    def fusedRun() = graft.operators.Sample.curriculumOrder(
      in, "doc_id", col("n_tokens"), buckets = 10, epoch = 3L)
    def legacyRun() = legacy(in, "doc_id", col("n_tokens"), 10, 3L)
    // bit-identity first: same (doc_id, tier, train_pos) everywhere
    val mismatches = fusedRun().select("doc_id", "tier", "train_pos")
      .exceptAll(legacyRun().select("doc_id", "tier", "train_pos"))
      .count()
    require(mismatches == 0,
      s"fused and legacy curriculum orders differ on $mismatches rows")
    def time(fn: () => DataFrame): Double = {
      val samples = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn().write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        System.gc()
        s
      }
      samples.min
    }
    val tLegacy = time(legacyRun _)
    val tFused = time(fusedRun _)
    def dp3(x: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(x))
    println(s"""CURRICULUM_AB {"legacy_sec":${dp3(tLegacy)},""" +
      s""""fused_sec":${dp3(tFused)},"identical":true,"sf":"$sfDir"}""")
    spark.stop()
  }
}
