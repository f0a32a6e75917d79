package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bench-only: the measurement q276 cannot make. The registered query
  * builds the IvfPq state AND runs one delta + probe in the same timed
  * window (oracle necessity, like q206's PrefixIndex build), so its
  * cost is dominated by the once-per-rebuild BUILD — not the claim
  * that matters at 100 TB, which is that a standing ANN pipeline's
  * PER-BATCH append cost is O(batch), independent of corpus size, and
  * that serving probes the persisted codes without re-training or
  * re-encoding anything. This main builds the state UNTIMED on the
  * standing corpus, then times three things separately, twice each
  * (min reported):
  *  - `delta`: [[graft.sim.IvfPq.applyDelta]] of a FIXED-size batch
  *    (default 500 vectors) — should stay ROUGHLY FLAT across the
  *    zipf decade; a 10x delta means the state isn't doing its job.
  *  - `full_encode`: the one-shot encode of the whole corpus — what
  *    every per-call ANN query (q124-q132 shape) pays today; the gap
  *    to `delta` is the lifecycle's win.
  *  - `probe`: 5 queries against the persisted codes.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=soak/zipf1 runMain
  * graft.tools.PqDeltaBench [batchVecs=500]` — one `PQ_DELTA` JSON
  * line.
  */
object PqDeltaBench {

  def main(args: Array[String]): Unit = {
    val batchVecs = if (args.nonEmpty) args(0).toLong else 500L
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
    val emb = graft.Tables.t(spark, sfDir, "embeddings")
      .select("vec_id", "embedding")
    val n = emb.count()
    val every = math.max(n / batchVecs, 1L)
    val batch = emb.filter(col("vec_id") % every === 0)
      .select((col("vec_id") + 10000000L).as("vec_id"), col("embedding"))
      .localCheckpoint(true) // batch staged; its read is not the delta's
    val nBatch = batch.count()
    // UNTIMED: the once-per-rebuild corpus-sized build
    val state = graft.sim.IvfPq.build(emb, "vec_id", "embedding",
      nlist = 16, m = 8, k = 16)
    state.codes.count() // settle the checkpoint
    val queries = emb.filter(col("vec_id") < 5).localCheckpoint(true)

    def timed(f: () => Unit): Double = {
      val t0 = System.nanoTime()
      f()
      (System.nanoTime() - t0) / 1e9
    }
    def minOf2(f: () => Unit): (Double, Double) = {
      val a = timed(f); val b = timed(f); (math.min(a, b), math.max(a, b))
    }
    // delta: encode ONLY the batch under the frozen codebooks
    // (applyDelta's localCheckpoint materializes the staged rows)
    val (dMin, dMax) = minOf2(() =>
      graft.sim.IvfPq.applyDelta(state, batch, "vec_id", "embedding"))
    // full_encode: what a per-call query pays — re-encode the corpus
    val st1 = graft.sim.IvfPq.applyDelta(state, batch, "vec_id",
      "embedding")
    val (fMin, fMax) = minOf2(() =>
      graft.sim.IvfPq
        .build(emb.unionByName(batch), "vec_id", "embedding",
          nlist = 16, m = 8, k = 16)
        .codes.write.format("noop").mode("overwrite").save())
    // probe: serve from the persisted codes
    val (pMin, pMax) = minOf2(() =>
      graft.sim.IvfPq.probe(st1, queries, "vec_id", "embedding",
          nprobe = 4, topK = 5)
        .write.format("noop").mode("overwrite").save())
    def dp3(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(s"""PQ_DELTA {"corpus_vecs":$n,"batch_vecs":$nBatch,""" +
      s""""delta_secs":${dp3(dMin)},"full_encode_secs":${dp3(fMin)},""" +
      s""""probe_secs":${dp3(pMin)},"samples":{"delta":[${dp3(dMin)},${dp3(dMax)}],""" +
      s""""full_encode":[${dp3(fMin)},${dp3(fMax)}],"probe":[${dp3(pMin)},${dp3(pMax)}]},""" +
      s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
