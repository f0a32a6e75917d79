package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** k-core decomposition by synchronous peeling: repeatedly delete ALL
  * nodes whose degree in the surviving subgraph is below `k`. The
  * k-core (maximal subgraph with min degree ≥ k) is UNIQUE, so the
  * result is order-independent — unlike sequential peeling, whose
  * intermediate states depend on visit order, the synchronous rounds
  * are a pure function of (edges, k, round), replayable in SQL by
  * unrolling. Density structure the near-dup/co-purchase graphs care
  * about: cores survive boilerplate stars and chains that inflate
  * plain connected components.
  *
  * Iteration discipline = [[ConnectedComponents]]'s: each round is ONE
  * materialized job (the degree aggregate + two endpoint semi-joins
  * flow lazily into an eager localCheckpoint whose observe() carries
  * the convergence count — no separate count job, no deep AQE
  * re-planning chains; the first cut of this loop left every round
  * lazy and the final action re-derived all rounds with the degree
  * union DOUBLING fan-out per round), and the superseded round's
  * checkpoint blocks are reclaimed immediately.
  *
  * Rounds to the fixpoint are data-dependent (≤ peel depth);
  * `maxRounds` bounds a replay, `toFixpoint` stops when a round
  * deletes nothing.
  */
object KCore {

  private val obsId = new java.util.concurrent.atomic.AtomicLong(0)
  private def checkpointWithCount(e: DataFrame): (DataFrame, Long) = {
    val obs = Observation(s"kcore_n_${obsId.incrementAndGet()}")
    val out = e.observe(obs, count(lit(1)).as("n")).localCheckpoint(true)
    (out, obs.get("n").asInstanceOf[Long])
  }

  /** Nodes of the (≤ `maxRounds`-peeled) k-core with their degree in
    * the surviving subgraph (at the fixpoint all are ≥ k; under a
    * truncating `maxRounds` some may still be below — one more round
    * would remove them).
    */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
            maxRounds: Int = 20, toFixpoint: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    var (surviving, n) = checkpointWithCount(edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct())
    var done = false
    var round = 0
    while (!done && round < maxRounds) {
      val deg = surviving.select(col("a").as("id"))
        .union(surviving.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("degree"))
      val keep = deg.filter(col("degree") >= k)
      val (next, nNext) = checkpointWithCount(surviving
        .join(keep.select(col("id").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("id").as("b")), Seq("b"), "left_semi")
        .select("a", "b"))
      ConnectedComponents.freeCheckpoint(surviving)
      done = toFixpoint && nNext == n
      n = nNext
      surviving = next
      round += 1
    }
    surviving.select(col("a").as("id"))
      .union(surviving.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("degree"))
  }
}
