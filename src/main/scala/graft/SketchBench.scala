package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the exact-groupBy vs CMS-prefilter crossover for
  * [[graft.operators.Sketches.heavyHitters]].
  *
  * The regimes mirror [[BloomBench]]: the naive `GROUP BY key HAVING
  * count >= t` shuffles every DISTINCT key, so its exchange scales with
  * the vocabulary; the Count-Min path aggregates a fixed-size sketch
  * map-side, then shuffles only rows whose key probes >= t — the heavy
  * slice plus bounded false positives (overestimate ≤ eps·N with the
  * sketch's confidence). Corpus: a near-unique long tail (`id + 10^9`)
  * with 97 planted heavy keys carrying 0.3% of rows; threshold picks
  * exactly the planted keys, eps sized so eps·N < t/2. Run:
  * `sbt 'runMain graft.SketchBench'`. Results recorded in COVERAGE.md.
  */
object SketchBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen/scheduler warmup so the first (smallest) line isn't
    // charged session startup — same policy as graft.Bench
    spark.range(1000000).selectExpr("sum(id) s").collect()
    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    println("| rows | distinct keys | threshold | exact s | cms s | hits |")
    println("|---|---|---|---|---|---|")
    for (n <- Seq(2000000L, 20000000L, 50000000L)) {
      val df = spark.range(n).select(
        when(col("id") % 1000 < 3, col("id") % 97)
          .otherwise(col("id") + 1000000000L).as("k"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count()
      val t = n * 3 / 1000 / 97 / 2 // half the planted per-key count
      val eps = math.max(1e-6, t.toDouble / (2.0 * n))
      val (exactS, exactN) = time(
        df.groupBy("k").agg(count(lit(1)).as("n"))
          .filter(col("n") >= t).count())
      System.gc()
      val (cmsS, cmsN) = time(
        graft.operators.Sketches.heavyHitters(df, "k", t, eps = eps).count())
      System.gc()
      require(exactN == cmsN, s"mismatch: exact=$exactN cms=$cmsN")
      println(f"| $n%,d | ~$n%,d | $t | $exactS%.2f | $cmsS%.2f | $cmsN |")
      df.unpersist()
    }
    spark.stop()
  }
}
