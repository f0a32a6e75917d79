package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization for embedding columns (Jégou et al. 2011,
  * "Product Quantization for Nearest Neighbor Search"): split each
  * vector into `m` subvectors, quantize every subvector to its nearest
  * of `k` per-subspace centroids, and keep only the `m` small codes —
  * a 64-dim float vector becomes 8 bytes, the compression that lets a
  * 100 TB embedding corpus sit in memory for ANN serving.
  *
  * Codebook: the deterministic-sample scheme this engine uses for IVF
  * ([[Similarity.ivfBuild]]) — the `k` corpus vectors with the smallest
  * portable id hash — but on the ENGINE-PORTABLE two-constant hash
  * ([[graft.operators.Sample.hashMod]]) rather than xxhash64, so
  * codebook selection, distances, and argmin are all replayable in
  * plain SQL: the ENCODE step is fully oracle-checked (q124), not
  * rows-only. Swap in offline k-means without changing the encode or
  * query paths.
  *
  * Determinism contract for the oracle: distances accumulate as a
  * sequential left fold of `(x−c)²` in DOUBLE (float→double casts are
  * exact, fold order fixed), and the argmin breaks ties by LOWEST code
  * (`array_position` finds the first minimum; the SQL twin orders by
  * `(dist, code)`), so the integer codes are bit-portable.
  */
object Pq {

  /** `m × k × (dim/m)` codebook: the `k` hash-smallest corpus vectors,
    * in hash order (code = rank in that order), split into `m`
    * subvectors. Collected to the driver — `k` vectors, not the corpus.
    */
  def pqTrain(emb: DataFrame, idCol: String, vecCol: String,
              m: Int = 8, k: Int = 16): Array[Array[Array[Double]]] = {
    val centroids = emb
      .select(col(idCol), Similarity.toDouble(col(vecCol)).as("v"))
      .orderBy(graft.operators.Sample.hashMod(col(idCol), 1000000L), col(idCol))
      .limit(k)
      .collect()
      .map(_.getSeq[Double](1).toArray)
    require(centroids.nonEmpty, "pqTrain needs a non-empty corpus")
    val dim = centroids.head.length
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val sub = dim / m
    Array.tabulate(m, centroids.length) { (s, c) =>
      centroids(c).slice(s * sub, (s + 1) * sub)
    }
  }

  /** Squared-L2 of a subvector against a literal centroid: sequential
    * left fold, bit-matched by the SQL twin's explicit term sum.
    */
  private def subDist(vd: Column, s: Int, sub: Int, cent: Array[Double]): Column =
    aggregate(
      zip_with(slice(vd, s * sub + 1, sub),
        array(cent.map(lit).toIndexedSeq: _*),
        (x, c) => (x - c) * (x - c)),
      lit(0.0), (acc, t) => acc + t)

  /** Long-format codes `(id, sub, code)` — one row per subspace, code =
    * index of the nearest centroid (ties to the lowest code). A pure
    * projection over the corpus: the codebook rides as an expression
    * FIELD of the fused native [[graft.functions.PqCodes]] (one
    * primitive loop per row — the composed m·k higher-order-function
    * tree ran interpreted at ~1 ms/row; measured 63 s → ~2 s on a
    * 64k-vector corpus), no join, no shuffle except the source's own.
    * Bit-identical to the composed form: same fold order, same
    * first-min argmin (PqCodes doc), so q124's oracle is unchanged.
    */
  def pqEncode(emb: DataFrame, idCol: String, vecCol: String,
               codebook: Array[Array[Array[Double]]]): DataFrame =
    emb.select(col(idCol),
        posexplode(graft.functions.PqCodes.of(col(vecCol), codebook)))
      .select(col(idCol), col("pos").cast("long").as("sub"),
        col("col").as("code"))

  /** Asymmetric-distance (ADC) approximate top-k: the query stays
    * exact, corpus vectors are represented by their codes. Per query,
    * a `k × m` lookup table of subdistances to every centroid (a tiny
    * cross join), then one equi-join on `(sub, code)` against the code
    * table and a sum per (query, doc) — candidates never form a cross
    * product with the corpus, and the corpus side is the 8-byte codes,
    * not the vectors.
    *
    * The per-pair total is NOT a plain `sum(d)`: partial-aggregation
    * order over doubles is nondeterministic, which would let ULP-level
    * reorderings flip near-tied ranks between runs (and vs the SQL
    * twin). Instead each subspace's distance lands in its own
    * conditional-`first` aggregate column (exactly one row per
    * (query, doc, sub), so `first` is total) and the m columns add in
    * a FIXED left-to-right chain — bit-deterministic, fully inside
    * whole-stage codegen, and replayed in DuckDB as
    * `list_reduce(list(d ORDER BY sub), +)` (q127's oracle; the
    * leading 0.0 of the SQL fold is exact under IEEE addition).
    */
  def pqTopK(codes: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, codebook: Array[Array[Array[Double]]],
             topK: Int): DataFrame = {
    val m = codebook.length
    val sub = codebook.head.head.length
    val qd = Similarity.toDouble(col(vecCol))
    // (query_id, sub, code, d): per-subspace distance lookup rows
    val lut = queries.select(col(idCol).as("query_id"), qd.as("qv"))
      .select(col("query_id"), posexplode(array((0 until m).map { s =>
        array(codebook(s).indices.map(c =>
          subDist(col("qv"), s, sub, codebook(s)(c))).toIndexedSeq: _*)
      }: _*)))
      .select(col("query_id"), col("pos").cast("long").as("sub"),
        posexplode(col("col")))
      .select(col("query_id"), col("sub"), col("pos").cast("long").as("code"),
        col("col").as("d"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("adist").asc, col("neighbor_id").asc)
    val dcols = (0 until m).map(s =>
      first(when(col("sub") === s, col("d")), ignoreNulls = true).as(s"__d$s"))
    val adist = (0 until m).map(s => col(s"__d$s")).reduce(_ + _)
    codes.withColumnRenamed(idCol, "neighbor_id")
      .join(broadcast(lut), Seq("sub", "code"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .groupBy("query_id", "neighbor_id")
      .agg(dcols.head, dcols.tail: _*)
      .withColumn("adist", adist)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select("query_id", "neighbor_id", "rnk")
  }

  /** The production ANN serving stack as ONE operator: IVF coarse
    * pruning + PQ-ADC re-rank. [[pqTopK]] alone is a brute scan over
    * codes (every code row meets every query — its win is memory, not
    * pruning; see COVERAGE's ANN table); pairing it with an inverted
    * file means each query only scores the `nprobe`/`nlist` fraction
    * of the corpus whose coarse cell it probes — the Jégou et al. 2011
    * IVFADC layout.
    *
    * Everything is derived from the PORTABLE hash codebook
    * ([[pqTrain]]), including the coarse quantizer (`coarseCb` =
    * `pqTrain(emb, id, vec, m = 1, k = nlist)` — full-width
    * "subvectors" are exactly coarse centroids), so coarse assignment,
    * probe selection, subdistances, and the final ranking ALL replay
    * in SQL: the whole serving stack is hash-oracled end-to-end
    * (q129), unlike the xxhash-seeded [[Similarity.ivfTopK]]. Swap in
    * k-means codebooks without changing the plan.
    *
    * Scale shape: corpus side = one narrow projection emitting
    * (coarse cell, sub, code) from two native [[graft.functions.PqCodes]]
    * calls — 1 + m smallints per vector, never the vectors; probes and
    * the per-query LUT broadcast; the only exchange is the final
    * (query, neighbor) aggregate, whose input is already pruned to the
    * probed cells. Determinism: every distance is a fold-ordered
    * double sum, every argmin/rank ties to the lowest code/id
    * ([[pqTopK]] notes apply verbatim).
    */
  def ivfPqTopK(emb: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, coarseCb: Array[Array[Array[Double]]],
                pqCb: Array[Array[Array[Double]]], nprobe: Int,
                topK: Int): DataFrame = {
    require(coarseCb.length == 1, "coarseCb must be pqTrain(..., m = 1, ...)")
    val m = pqCb.length
    val dim = coarseCb.head.head.length
    val nlist = coarseCb.head.length
    require(nprobe >= 1 && nprobe <= nlist, s"nprobe must be in [1, $nlist]")
    // corpus: (neighbor_id, list_id, sub, code) in one pass — both
    // quantizers are native projections over the same scan
    val corpusSide = emb.select(col(idCol).as("neighbor_id"),
        element_at(graft.functions.PqCodes.of(col(vecCol), coarseCb), 1)
          .as("list_id"),
        posexplode(graft.functions.PqCodes.of(col(vecCol), pqCb)))
      .select(col("neighbor_id"), col("list_id"),
        col("pos").cast("long").as("sub"), col("col").as("code"))
    // probes: the nprobe coarse cells nearest each query, ties to the
    // lowest cell id — same (dist, code) order the assign argmin uses
    val qd = Similarity.toDouble(col(vecCol))
    val pw = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cdist").asc, col("list_id").asc)
    val probes = queries
      .select(col(idCol).as("query_id"), qd.as("qv"))
      .select(col("query_id"), posexplode(array(
        coarseCb.head.indices.map(c =>
          subDist(col("qv"), 0, dim, coarseCb.head(c))).toIndexedSeq: _*)))
      .select(col("query_id"), col("pos").cast("long").as("list_id"),
        col("col").as("cdist"))
      .withColumn("prnk", row_number().over(pw))
      .filter(col("prnk") <= nprobe)
      .select("query_id", "list_id")
    // per-query subdistance LUT (as pqTopK), keyed by query for the
    // probe-restricted join
    val sub = pqCb.head.head.length
    val lut = queries.select(col(idCol).as("query_id"), qd.as("qv"))
      .select(col("query_id"), posexplode(array((0 until m).map { s =>
        array(pqCb(s).indices.map(c =>
          subDist(col("qv"), s, sub, pqCb(s)(c))).toIndexedSeq: _*)
      }: _*)))
      .select(col("query_id"), col("pos").cast("long").as("sub"),
        posexplode(col("col")))
      .select(col("query_id"), col("sub"), col("pos").cast("long").as("code"),
        col("col").as("d"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("adist").asc, col("neighbor_id").asc)
    val dcols = (0 until m).map(s =>
      first(when(col("sub") === s, col("d")), ignoreNulls = true).as(s"__d$s"))
    val adist = (0 until m).map(s => col(s"__d$s")).reduce(_ + _)
    corpusSide
      .join(broadcast(probes), Seq("list_id"))
      .join(broadcast(lut), Seq("query_id", "sub", "code"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .groupBy("query_id", "neighbor_id")
      .agg(dcols.head, dcols.tail: _*)
      .withColumn("adist", adist)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select("query_id", "neighbor_id", "rnk")
  }
}
