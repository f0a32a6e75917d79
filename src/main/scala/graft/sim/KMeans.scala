package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Corpus-scale spherical Lloyd k-means over an embedding column — the
  * clustering primitive the curation stack leans on (SemDeDup's
  * cluster-confined dedup, cluster-balanced sampling, IVF coarse
  * quantizers all take a clustering as input). Complements
  * [[Pq.pqKMeans]], which trains per-SUBSPACE codebooks on a bounded
  * SAMPLE (collect–sort–fold means — the Jégou training regime): this
  * one clusters FULL vectors over the whole corpus with DISTRIBUTED
  * recentering, so cluster sizes of 10⁹ vectors never touch the
  * driver.
  *
  * Per iteration, exactly two jobs and no corpus shuffle of vectors:
  *  - ASSIGN: one fused [[graft.functions.CentroidScores]] projection
  *    against the literal centroid matrix (cosine score — `|v|` is
  *    rank-invariant per row); argmax by first-maximum index after a
  *    9-dp round (ties break to the LOWEST cluster id).
  *  - RECENTER: posexplode to (cluster, dim, x) and one map-side-
  *    combinable aggregate into k×dim groups — exact DECIMAL(30,15)
  *    sums (partial-order-independent), one closing IEEE division.
  *    Only k×dim rows reach the driver. Spherical assignment scores
  *    divide by the centroid norm, so unnormalized means ARE the
  *    correct spherical centroids.
  *
  * Initialization is the engine's deterministic portable-hash sample
  * ([[graft.operators.Sample.hashMod2]]-smallest ids — the q124
  * codebook discipline), so selection, fold-ordered scores, argmax
  * tiebreaks, and every recentered coordinate replay in plain SQL:
  * the whole TRAINED assignment is hash-oracled (q250), not
  * rows-only. An empty cluster keeps its previous centroid (both
  * sides of the oracle). `initCandidates > 1` switches to an
  * oversample-then-reduce seeding (the k-means‖ idea with a
  * deterministic reduction): collect `initCandidates·k` hash-smallest
  * vectors — still a k-bounded collect — and pick k by greedy
  * farthest-first (max-min cosine distance, first candidate = the
  * hash-smallest, ties to the lower candidate rank), which cannot
  * seed all k centroids inside one dense region the way a plain hash
  * sample can on skewed corpora. The default (1) is the oracled
  * registry behavior, bit-for-bit.
  *
  * Convergence: `tolerance` stops iterating once no centroid's
  * recenter step moves it by more than `tolerance` (L2); the returned
  * assignment is the one under the centroids BEFORE that final
  * sub-tolerance move. At the default 0.0 this fires only on EXACT
  * fixpoints, where the next assignment is identical anyway — so
  * early-stop == full-iters bit-for-bit (unit-pinned) and the
  * registered oracle is unaffected; convergence-grade runs pass
  * `iters` as a cap and a real tolerance instead of hard-coding
  * rounds.
  *
  * Degenerate inputs fail loudly, never silently (the CentroidScores
  * score divides by the centroid norm — a zero-norm centroid would
  * yield NaN scores and `array_position` would emit cluster −1):
  * a zero vector among the init seeds is a `require` failure at init,
  * and a recentered mean that cancels to exactly zero keeps the
  * previous centroid, same as an empty cluster.
  *
  * Output: one row per input vector, `(idCol, cluster)` — the
  * assignment under the final recentered centroids.
  */
object KMeans {

  private def l2(v: Seq[Double]): Double =
    math.sqrt(v.map(x => x * x).sum)

  /** Greedy farthest-first reduction of `cand` (in hash rank order) to
    * k seeds: start from the hash-smallest, then repeatedly take the
    * candidate whose minimum cosine distance to the chosen set is
    * largest (ties to the lower rank). Driver-side over ≤ c·k rows.
    */
  private[sim] def farthestFirst(cand: IndexedSeq[Seq[Double]],
                                 k: Int): Seq[Seq[Double]] = {
    val norms = cand.map(l2)
    def cosDist(i: Int, j: Int): Double = {
      val dot = cand(i).lazyZip(cand(j)).map(_ * _).sum
      1.0 - dot / (norms(i) * norms(j))
    }
    val chosen = scala.collection.mutable.ArrayBuffer(0)
    val minDist = Array.tabulate(cand.size)(i => cosDist(i, 0))
    while (chosen.size < k) {
      var best = -1
      var bestD = Double.NegativeInfinity
      var i = 0
      while (i < cand.size) {
        if (!chosen.contains(i) && minDist(i) > bestD) {
          best = i; bestD = minDist(i)
        }
        i += 1
      }
      chosen += best
      var j = 0
      while (j < cand.size) {
        val d = cosDist(j, best)
        if (d < minDist(j)) minDist(j) = d
        j += 1
      }
    }
    chosen.map(cand(_)).toSeq
  }

  def fit(emb: DataFrame, idCol: String, vecCol: String, k: Int = 8,
          iters: Int = 2, seed: Long = 7L, tolerance: Double = 0.0,
          initCandidates: Int = 1): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(tolerance >= 0, s"tolerance must be >= 0, got $tolerance")
    require(initCandidates >= 1,
      s"initCandidates must be >= 1, got $initCandidates")
    val acc = DecimalType(30, 15)
    val v = emb
      .select(col(idCol), Similarity.toDouble(col(vecCol)).as("__v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // deterministic init: the c·k portable-hash-smallest vectors, in
    // hash order (c = 1: cluster id = rank, the oracled default;
    // c > 1: greedy farthest-first reduction) — c·k rows collected,
    // never the corpus
    val cand = v
      .orderBy(graft.operators.Sample.hashMod2(col(idCol), 1000000000L,
        seed), col(idCol))
      .limit(k * initCandidates)
      .select("__v")
      .collect().map(_.getSeq[Double](0).toSeq).toIndexedSeq
    require(cand.nonEmpty, "kMeans needs a non-empty corpus")
    require(cand.forall(l2(_) > 0),
      "kMeans init drew a zero vector — the spherical score divides " +
        "by centroid norms; drop zero embeddings upstream or reseed")
    var cents: Seq[Seq[Double]] =
      if (initCandidates == 1 || cand.size <= k) cand.take(k).toSeq
      else farthestFirst(cand, k)
    val dim = cents.head.size

    def assign(): DataFrame = {
      val sc = transform(
        graft.functions.CentroidScores.scores(col("__v"),
          typedlit(cents)),
        s => round(s, 9))
      v.withColumn("__sc", sc)
        .withColumn("cluster",
          (array_position(col("__sc"), array_max(col("__sc"))) - 1)
            .cast("int"))
        .drop("__sc")
    }

    var assigned = assign()
    var it = 2
    var converged = false
    while (it <= iters && !converged) {
      // recenter: k×dim exact-decimal group means; empty clusters —
      // and zero-cancelled means, which the spherical score cannot
      // normalize — keep their previous centroid
      val stats = assigned
        .select(col("cluster"), posexplode(col("__v")).as(Seq("d", "x")))
        .groupBy("cluster", "d")
        .agg(sum(col("x").cast(acc)).cast("double").as("sx"),
          count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.toArray).toArray
      stats.groupBy(_.getInt(0)).foreach { case (c, rows) =>
        val arr = new Array[Double](dim)
        rows.foreach(r => arr(r.getInt(1)) =
          r.getDouble(2) / r.getLong(3).toDouble)
        if (l2(arr.toSeq) > 0) next(c) = arr
      }
      val shift = cents.lazyZip(next).map { (a, b) =>
        l2(a.lazyZip(b).map(_ - _).toSeq)
      }.max
      if (shift <= tolerance) converged = true
      else {
        cents = next.map(_.toSeq).toSeq
        assigned = assign()
      }
      it += 1
    }
    val out = assigned
      .select(col(idCol), col("cluster").cast("long").as("cluster"))
      .localCheckpoint(true)
    v.unpersist()
    out
  }
}
