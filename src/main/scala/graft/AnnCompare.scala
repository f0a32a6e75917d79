package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sim.{Pq, Similarity}

/** ANN index bake-off harness (dev tool, not a pipeline operator): runs
  * brute-force cosine, multi-table SRP-LSH, IVF, and PQ-ADC top-k over
  * the SAME corpus and query set, reporting wall seconds (index build
  * and query timed separately where the method has a build phase) and
  * recall@k against the brute-force truth. Results are recorded in
  * COVERAGE.md ("ANN recall/cost" section) so a user can pick an index
  * per regime instead of guessing.
  *
  * The sf embeddings tables are small (2k rows at sf0.1), so the
  * corpus is expanded `Expand`-fold into a deterministic cluster
  * mixture: every source vector is a cluster CENTER whose copies carry
  * per-coordinate pseudo-noise with amplitude GRADED by copy index
  * (~1% for the nearest copy up to ~6% for the farthest), so each
  * query's true top-k has distinct, well-separated distances. The r9
  * harness used a flat ~2% amplitude for all copies — the 32 members
  * of a cluster then tied at essentially one distance, capping every
  * quantized method at the tie ceiling (~0.35 recall@10) REGARDLESS of
  * codebook quality; the graded mixture is what lets recall numbers
  * actually rank codebooks (r9 verdict item 8). Usage:
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.AnnCompare [expand] [nQueries]"`.
  */
object AnnCompare {
  private val Expand = 32
  private val K = 10

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val expand = args.headOption.map(_.toInt).getOrElse(Expand)
    val nQueries = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id) s").collect()

    // corpus: each source vector is a cluster center spawning `expand`
    // deterministic perturbed members; the j=0 copy gets ZERO noise, so
    // it IS the original and every query is a true member of the
    // expanded corpus (self-match counts toward recall, the usual
    // ANN-bench setup). Noise amplitude GRADES with j (~1% at j=1 up
    // to ~6% at j=expand-1): within a cluster the true neighbor order
    // is j-monotone with distinct distances, so a better codebook
    // measurably ranks them better (a flat amplitude ties all members
    // at one distance and caps quantized recall at the tie ceiling).
    val base = graft.Tables.t(spark, sfDir, "embeddings")
      .select("vec_id", "embedding")
    val corpus = base
      .select(col("vec_id"), col("embedding"),
        explode(sequence(lit(0), lit(expand - 1))).as("j"))
      .select((col("vec_id") * expand + col("j")).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x + x * when(col("j") === 0, lit(0.0)).otherwise(
            ((pmod(col("vec_id") * 7919 + i * 104729 + col("j") * 15485863,
              lit(97)).cast("double") - 48) / 2400.0) *
              (lit(0.45) + col("j").cast("double") * lit(2.55) /
                lit((expand - 1).max(1)))))
          .cast("float")).as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = corpus.count()
    val queries = base.filter(col("vec_id") < nQueries)
      .select((col("vec_id") * expand).as("vec_id"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    queries.count()
    println(s"ANN corpus=$n queries=$nQueries k=$K dim=64")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def topSets(df: DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) =>
          q -> rs.map(_.getLong(1)).toSet
        }
    def recall(got: Map[Long, Set[Long]], truth: Map[Long, Set[Long]]): Double =
      truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
      }.sum / truth.size

    val (truth, tBrute) = timed(topSets(
      Similarity.bruteTopK(corpus, queries, "vec_id", "embedding", K)))
    println(f"RESULT brute      query=$tBrute%6.2fs recall@$K=1.000")

    val (lsh, tLsh) = timed(topSets(Similarity.lshTopK(
      corpus, queries, "vec_id", "embedding", K, bits = 8, dim = 64, tables = 8)))
    println(f"RESULT lsh(8x8b)  query=$tLsh%6.2fs recall@$K=${recall(lsh, truth)}%.3f")

    val (ivfIdx, tIvfBuild) = timed {
      val (assigned, matrix) =
        Similarity.ivfBuild(corpus, "vec_id", "embedding", nlist = 64)
      assigned.count() // materialize the index cache
      (assigned, matrix)
    }
    val (ivf, tIvf) = timed(topSets(Similarity.ivfQuery(
      ivfIdx._1, ivfIdx._2, queries, "vec_id", "embedding", K, nprobe = 8)))
    ivfIdx._1.unpersist()
    println(f"RESULT ivf(64/8)  build=$tIvfBuild%6.2fs query=$tIvf%6.2fs " +
      f"recall@$K=${recall(ivf, truth)}%.3f")

    val (ivfpqPrep, tIvfpqBuild) = timed {
      val coarse = Pq.pqTrain(corpus, "vec_id", "embedding", m = 1, k = 64)
      val pqcb = Pq.pqTrain(corpus, "vec_id", "embedding", m = 8, k = 16)
      (coarse, pqcb)
    }
    val (ivfpq, tIvfpq) = timed(topSets(Pq.ivfPqTopK(
      corpus, queries, "vec_id", "embedding", ivfpqPrep._1, ivfpqPrep._2,
      nprobe = 8, topK = K)))
    println(f"RESULT ivfpq(64/8) build=$tIvfpqBuild%6.2fs query=$tIvfpq%6.2fs " +
      f"recall@$K=${recall(ivfpq, truth)}%.3f")

    // PQ at k=16 (the oracled small config) and k=256 (the production
    // serving layout), hash-picked vs Lloyd-trained codebooks. Training
    // runs on the unexpanded originals (the j=0 rows) — the
    // sample-train / full-corpus-encode regime.
    val trainSet = corpus.filter(pmod(col("vec_id"), lit(expand)) === 0)
    def pqRun(label: String, kk: Int,
              train: () => Array[Array[Array[Double]]]): Unit = {
      val (prep, tBuild) = timed {
        val cb = train()
        val codes = Pq.pqEncode(corpus, "vec_id", "embedding", cb)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        codes.count()
        (cb, codes)
      }
      val (got, tQ) = timed(topSets(Pq.pqTopK(
        prep._2, queries, "vec_id", "embedding", prep._1, K)))
      prep._2.unpersist()
      val mse = Pq.quantizationError(corpus, "vec_id", "embedding", prep._1)
      println(f"RESULT $label%-13s build=$tBuild%6.2fs query=$tQ%6.2fs " +
        f"recall@$K=${recall(got, truth)}%.3f mse=$mse%.5f")
    }
    pqRun("pq(8x16)", 16,
      () => Pq.pqTrain(corpus, "vec_id", "embedding", m = 8, k = 16))
    pqRun("pqKM(8x16)", 16,
      () => Pq.kmeansTrain(trainSet, "vec_id", "embedding", m = 8, k = 16, iters = 4))
    pqRun("pq(8x256)", 256,
      () => Pq.pqTrain(corpus, "vec_id", "embedding", m = 8, k = 256))
    pqRun("pqKM(8x256)", 256,
      () => Pq.kmeansTrain(trainSet, "vec_id", "embedding", m = 8, k = 256, iters = 4))

    val (ivfpqtPrep, tIvfpqtBuild) = timed {
      val coarse = Pq.kmeansTrain(trainSet, "vec_id", "embedding",
        m = 1, k = 64, iters = 4)
      val pqcb = Pq.kmeansTrain(trainSet, "vec_id", "embedding",
        m = 8, k = 256, iters = 4)
      (coarse, pqcb)
    }
    val (ivfpqt, tIvfpqt) = timed(topSets(Pq.ivfPqTopK(
      corpus, queries, "vec_id", "embedding", ivfpqtPrep._1, ivfpqtPrep._2,
      nprobe = 8, topK = K)))
    println(f"RESULT ivfpqKM(64/8,8x256) build=$tIvfpqtBuild%6.2fs query=$tIvfpqt%6.2fs " +
      f"recall@$K=${recall(ivfpqt, truth)}%.3f")

    // ADC+R: the quantized stack nominates 10K candidates per query,
    // exact distances re-rank ONLY those — recall recovers to ~1
    // without ever scanning the corpus with true vectors
    val (rr, tRr) = timed(topSets(Pq.exactRerank(
      Pq.ivfPqTopK(corpus, queries, "vec_id", "embedding",
        ivfpqtPrep._1, ivfpqtPrep._2, nprobe = 8, topK = 10 * K),
      corpus, queries, "vec_id", "embedding", K)))
    println(f"RESULT ivfpqKM+rerank(R=${10 * K}) query=$tRr%6.2fs " +
      f"recall@$K=${recall(rr, truth)}%.3f")

    spark.stop()
  }
}
