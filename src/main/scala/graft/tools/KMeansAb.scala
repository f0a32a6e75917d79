package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bench-only A/B for the two [[graft.sim.KMeans]] initializations —
  * QUALITY, not time (AbBench covers time): same corpus, same k, same
  * iteration cap, hash-smallest init (`initCandidates = 1`, the
  * oracled registry default) vs oversample-then-reduce farthest-first
  * (`initCandidates = c > 1`). Reports spherical INERTIA — the mean
  * cosine distance of every vector to its own cluster's recentered
  * mean, computed distributively from the assignment alone (k×dim
  * group means, the same recenter shape as training; no corpus
  * collect) — plus cluster-size dispersion, the two numbers that tell
  * whether a seeding strategy actually bought anything at equal
  * rounds.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=soak/zipf1 runMain graft.tools.KMeansAb
  * [k=10] [iters=4] [candidates=4]` — prints one `KMEANS_AB` JSON
  * line.
  */
object KMeansAb {

  /** Mean cosine distance to the assigned cluster's mean vector — one
    * posexplode aggregate for the centroids, one fused dot/norm pass
    * for the distances. Returns (inertia, maxClusterShare).
    */
  private def inertia(emb: DataFrame, assigned: DataFrame,
                      idCol: String, vecCol: String): (Double, Double) = {
    val v = emb.select(col(idCol),
      graft.sim.Similarity.toDouble(col(vecCol)).as("__v"))
      .join(assigned, Seq(idCol))
    val cents = v
      .select(col("cluster"), posexplode(col("__v")).as(Seq("d", "x")))
      .groupBy("cluster", "d").agg(avg("x").as("m"))
      .groupBy("cluster")
      .agg(array_sort(collect_list(struct(col("d"), col("m")))).as("dm"))
      .select(col("cluster"), transform(col("dm"), _.getField("m")).as("c"))
    val scored = v.join(broadcast(cents), Seq("cluster"))
      .select(
        (lit(1.0) -
          aggregate(zip_with(col("__v"), col("c"), (a, b) => a * b),
            lit(0.0), (acc, x) => acc + x) /
          (sqrt(aggregate(col("__v"), lit(0.0), (a, x) => a + x * x)) *
            sqrt(aggregate(col("c"), lit(0.0), (a, x) => a + x * x))))
          .as("dist"))
      .agg(avg("dist")).head.getDouble(0)
    val shares = assigned.groupBy("cluster").count()
      .agg(max("count").cast("double") / sum("count")).head.getDouble(0)
    (scored, shares)
  }

  def main(args: Array[String]): Unit = {
    val k = if (args.length > 0) args(0).toInt else 10
    val iters = if (args.length > 1) args(1).toInt else 4
    val c = if (args.length > 2) args(2).toInt else 4
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables.t(spark, sfDir, "embeddings")
      .select("vec_id", "embedding")
    def run(cands: Int): (Double, Double) = {
      val a = graft.sim.KMeans.fit(emb, "vec_id", "embedding", k = k,
        iters = iters, initCandidates = cands)
      inertia(emb, a, "vec_id", "embedding")
    }
    val (ih, sh) = run(1)
    val (io, so) = run(c)
    def dp6(x: Double) =
      String.format(java.util.Locale.ROOT, "%.6f", Double.box(x))
    println(s"""KMEANS_AB {"k":$k,"iters":$iters,"candidates":$c,""" +
      s""""hash_inertia":${dp6(ih)},"oversample_inertia":${dp6(io)},""" +
      s""""hash_max_share":${dp6(sh)},"oversample_max_share":${dp6(so)},""" +
      s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
