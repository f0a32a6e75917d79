package graft.sim

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class PqSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // 8-dim vectors, m=2 subspaces of 4, k=4 centroids
  private def emb = Seq(
    (1L, Array(1.0f, 0f, 0f, 0f, 9f, 9f, 0f, 0f)),
    (2L, Array(0.9f, 0.1f, 0f, 0f, 9f, 8.5f, 0f, 0f)),
    (3L, Array(0f, 5f, 5f, 0f, 0f, 0f, 7f, 7f)),
    (4L, Array(0f, 5.2f, 4.8f, 0f, 0f, 0f, 7f, 6.9f)),
    (5L, Array(3f, 3f, 3f, 3f, 1f, 2f, 3f, 4f)),
    (6L, Array(1.0f, 0f, 0f, 0f, 9f, 9f, 0f, 0f)) // exact dup of 1
  ).toDF("vec_id", "embedding")

  /** Driver-side reference encode with the same fold order. */
  private def refCodes(cb: Array[Array[Array[Double]]],
                       vecs: Map[Long, Array[Double]]): Map[(Long, Long), Long] = {
    val m = cb.length; val sub = cb.head.head.length
    (for {
      (id, v) <- vecs.toSeq; s <- 0 until m
    } yield {
      val dists = cb(s).map { c =>
        var acc = 0.0
        var i = 0
        while (i < sub) { val t = v(s * sub + i) - c(i); acc += t * t; i += 1 }
        acc
      }
      ((id, s.toLong), dists.indexOf(dists.min).toLong)
    }).toMap
  }

  test("pqTrain shape and hash-deterministic codebook order") {
    val cb = Pq.pqTrain(emb, "vec_id", "embedding", m = 2, k = 4)
    assert(cb.length == 2 && cb.head.length == 4 && cb.head.head.length == 4)
    val again = Pq.pqTrain(emb.repartition(5), "vec_id", "embedding", m = 2, k = 4)
    assert(cb.map(_.map(_.toSeq).toSeq).toSeq == again.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("pqEncode matches a driver-side argmin; exact duplicates share codes") {
    val cb = Pq.pqTrain(emb, "vec_id", "embedding", m = 2, k = 4)
    val got = Pq.pqEncode(emb, "vec_id", "embedding", cb)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    assert(got == refCodes(cb, vecs))
    assert((0L until 2L).forall(s => got((1L, s)) == got((6L, s))))
  }

  test("native encode: interpreted path agrees with codegen; bad dims -> null") {
    val cb = Pq.pqTrain(emb, "vec_id", "embedding", m = 2, k = 4)
    val sel = Pq.pqEncode(emb, "vec_id", "embedding", cb)
    val withCodegen = sel.collect().map(_.toString).toSeq.sorted
    val prev = spark.conf.getOption("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpreted = sel.collect().map(_.toString).toSeq.sorted
      assert(interpreted == withCodegen)
    } finally prev.foreach(spark.conf.set("spark.sql.codegen.wholeStage", _))
    // a vector whose length != m*sub yields null codes -> no rows after
    // posexplode, not a crash
    val bad = Seq((9L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    assert(Pq.pqEncode(bad, "vec_id", "embedding", cb).count() == 0)
    // a null SLOT also nulls the row (HOF-composed semantics: null
    // propagates), never silently encodes the slot as 0.0
    val nullSlot = Seq(
        (10L, Array[java.lang.Float](1f, null, 0f, 0f, 9f, 9f, 0f, 0f)),
        (11L, Array[java.lang.Float](1f, 0f, 0f, 0f, 9f, 9f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val codes = nullSlot.select($"vec_id",
      graft.functions.PqCodes.of($"embedding", cb).as("codes"))
    assert(codes.filter($"codes".isNull).select("vec_id")
      .as[Long].collect().toSeq == Seq(10L))
  }

  /** Driver-side Lloyd's with the SAME pinned fold orders (assign:
    * j-ascending distance fold, first-min argmin; mean: 0.0-seeded fold
    * over values in id order) — the single-threaded truth kmeansTrain
    * must reproduce bit-for-bit.
    */
  private def refKmeans(init: Array[Array[Array[Double]]],
                        vecs: Seq[(Long, Array[Double])],
                        iters: Int): Array[Array[Array[Double]]] = {
    val m = init.length; val k = init.head.length; val sub = init.head.head.length
    var cb = init.map(_.map(_.clone))
    for (_ <- 1 to iters) {
      val assign = refCodes(cb, vecs.toMap)
      val next = Array.tabulate(m, k, sub)((s, c, j) => cb(s)(c)(j))
      for (s <- 0 until m; c <- 0 until k; j <- 0 until sub) {
        val members = vecs.filter { case (id, _) => assign((id, s.toLong)) == c }
          .sortBy(_._1)
        if (members.nonEmpty) {
          var acc = 0.0
          members.foreach { case (_, v) => acc += v(s * sub + j) }
          next(s)(c)(j) = acc / members.length
        }
      }
      cb = next
    }
    cb
  }

  test("kmeansTrain: iters=0 is pqTrain; matches driver-side Lloyd bit-for-bit") {
    def flat(cb: Array[Array[Array[Double]]]) = cb.map(_.map(_.toSeq).toSeq).toSeq
    assert(flat(Pq.kmeansTrain(emb, "vec_id", "embedding", m = 2, k = 4, iters = 0)) ==
      flat(Pq.pqTrain(emb, "vec_id", "embedding", m = 2, k = 4)))
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toSeq
    val init = Pq.pqTrain(emb, "vec_id", "embedding", m = 2, k = 4)
    for (t <- Seq(1, 3)) {
      val got = Pq.kmeansTrain(emb, "vec_id", "embedding", m = 2, k = 4, iters = t)
      assert(flat(got) == flat(refKmeans(init, vecs, t)), s"iters=$t")
    }
    // partitioning must not leak into the floats (the fold is ordered)
    val repart = Pq.kmeansTrain(emb.repartition(7), "vec_id", "embedding",
      m = 2, k = 4, iters = 3)
    assert(flat(repart) == flat(refKmeans(init, vecs, 3)))
  }

  test("kmeansTrain descends the quantization objective; empty clusters persist") {
    // 6 vectors, k=4: at least one centroid can end up empty — it must
    // keep its previous value (both here and in the SQL twin)
    val e0 = Pq.quantizationError(emb, "vec_id", "embedding",
      Pq.kmeansTrain(emb, "vec_id", "embedding", m = 2, k = 4, iters = 0))
    val errs = (1 to 3).map(t => Pq.quantizationError(emb, "vec_id", "embedding",
      Pq.kmeansTrain(emb, "vec_id", "embedding", m = 2, k = 4, iters = t)))
    (e0 +: errs).sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-12, s"objective rose: $a -> $b") }
    assert(errs.last < e0, "training never improved on the hash codebook")
  }

  test("ivfPqTopK with nprobe = nlist equals the unpruned ADC ranking") {
    val coarse = Pq.pqTrain(emb, "vec_id", "embedding", m = 1, k = 4)
    val pqcb = Pq.pqTrain(emb, "vec_id", "embedding", m = 2, k = 4)
    val queries = emb.filter($"vec_id" <= 2)
    // probing every cell prunes nothing, so the stack must reproduce
    // pqTopK's full ADC ranking bit-for-bit
    val full = Pq.pqTopK(Pq.pqEncode(emb, "vec_id", "embedding", pqcb),
        queries, "vec_id", "embedding", pqcb, topK = 3)
      .as[(Long, Long, Int)].collect().toSet
    val stacked = Pq.ivfPqTopK(emb, queries, "vec_id", "embedding",
        coarse, pqcb, nprobe = 4, topK = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(stacked == full)
    // pruned probing returns a (deterministic) subset of candidates
    val pruned = Pq.ivfPqTopK(emb, queries, "vec_id", "embedding",
        coarse, pqcb, nprobe = 1, topK = 3)
      .as[(Long, Long, Int)].collect()
    assert(pruned.nonEmpty && pruned.length <= full.size)
    val again = Pq.ivfPqTopK(emb.repartition(5), queries, "vec_id", "embedding",
        coarse, pqcb, nprobe = 1, topK = 3)
      .as[(Long, Long, Int)].collect()
    assert(pruned.sortBy(r => (r._1, r._3)).toSeq == again.sortBy(r => (r._1, r._3)).toSeq)
    // plan budget: probes and LUT broadcast; exchanges are exactly the
    // probe-rank window (tiny: queries x nlist), the (query, neighbor)
    // aggregate, and the rank window — never the corpus vectors
    val plan = Pq.ivfPqTopK(emb, queries, "vec_id", "embedding",
      coarse, pqcb, nprobe = 2, topK = 3)
    graft.audit.PlanGuard.assertNoCartesian(plan)
    graft.audit.PlanGuard.assertMaxExchanges(plan, 3)
  }

  test("exactRerank on a full candidate list reproduces the exact L2 top-k") {
    val cands = emb.select($"vec_id".as("neighbor_id"))
      .crossJoin(emb.filter($"vec_id" === 1).select($"vec_id".as("query_id")))
      .filter($"neighbor_id" =!= $"query_id")
    val got = Pq.exactRerank(cands, emb, emb.filter($"vec_id" === 1),
        "vec_id", "embedding", topK = 3)
      .orderBy("rnk").as[(Long, Long, Int)].collect().toSeq
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val q = vecs(1L)
    val expected = vecs.toSeq.filter(_._1 != 1L)
      .map { case (id, v) =>
        var acc = 0.0; var i = 0
        while (i < v.length) { val t = q(i) - v(i); acc += t * t; i += 1 }
        (id, acc)
      }
      .sortBy { case (id, dd) => (dd, id) }.take(3).zipWithIndex
      .map { case ((id, _), i) => (1L, id, i + 1) }
    assert(got == expected)
    // the exact dup of vec 1 must re-rank to the top — the within-cell
    // resolution ADC alone cannot provide
    assert(got.head._2 == 6L)
    // ADC+R composition: quantized nominate -> exact re-rank
    val cb = Pq.pqTrain(emb, "vec_id", "embedding", m = 2, k = 4)
    val coarse = Pq.pqTrain(emb, "vec_id", "embedding", m = 1, k = 2)
    val nominated = Pq.ivfPqTopK(emb, emb.filter($"vec_id" === 1), "vec_id",
      "embedding", coarse, cb, nprobe = 2, topK = 5)
    val rr = Pq.exactRerank(nominated, emb, emb.filter($"vec_id" === 1),
        "vec_id", "embedding", topK = 3)
      .orderBy("rnk").as[(Long, Long, Int)].collect().toSeq
    assert(rr == expected) // nprobe=all nominates a superset of the true top-3
    graft.audit.PlanGuard.assertNoCartesian(
      Pq.exactRerank(nominated, emb, emb.filter($"vec_id" === 1),
        "vec_id", "embedding", topK = 3))
  }

  test("pqTopK reproduces the driver-computed ADC ranking exactly") {
    val cb = Pq.pqTrain(emb, "vec_id", "embedding", m = 2, k = 4)
    val codes = Pq.pqEncode(emb, "vec_id", "embedding", cb)
    val out = Pq.pqTopK(codes, emb.filter($"vec_id" === 1), "vec_id",
        "embedding", cb, topK = 3)
      .orderBy("rnk").as[(Long, Long, Int)].collect()

    // reference: adist(doc) = sum_s dist(query_s, centroid(code(doc, s)));
    // ranking by (adist, id) — the operator's documented tiebreak
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val rc = refCodes(cb, vecs)
    val q = vecs(1L)
    def sd(s: Int, c: Long): Double = {
      val cent = cb(s)(c.toInt); var acc = 0.0; var i = 0
      while (i < cent.length) { val t = q(s * 4 + i) - cent(i); acc += t * t; i += 1 }
      acc
    }
    val expected = vecs.keys.filter(_ != 1L).toSeq
      .map(id => (id, (0 until 2).map(s => sd(s, rc((id, s.toLong)))).sum))
      .sortBy { case (id, d) => (d, id) }
      .take(3).zipWithIndex
      .map { case ((id, _), i) => (1L, id, i + 1) }
    assert(out.toSeq == expected)
    // the byte-identical duplicate can tie with a same-code doc but
    // must be present in the top ranks
    assert(out.map(_._2).contains(6L))
  }

  test("kmeansAssign (m=1) is the full-vector nearest-centroid argmin") {
    val cb = Pq.kmeansTrain(emb, "vec_id", "embedding", m = 1, k = 4, iters = 1)
    val got = Pq.kmeansAssign(emb, "embedding", cb)
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val expected = vecs.map { case (id, v) =>
      id -> refCodes(cb, Map(id -> v))((id, 0L))
    }
    assert(got == expected)
    assert(got(1L) == got(6L)) // exact dup, same cluster
  }

  test("clusterBalancedSample equals the driver-side replay exactly") {
    val embR = graft.Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding")
    val out = Pq.clusterBalancedSample(embR, "vec_id", "embedding",
        k = 8, iters = 1)
      .select("vec_id", "cluster").as[(Long, Long)].collect().toSet

    // replay: trained assignment (kmeansTrain/Assign are bit-pinned and
    // unit-proven above), per-cluster ppm rate floor(1e6·min/cnt), and
    // the exact hashMod2 verdict — the composite must match row-for-row
    val cb = Pq.kmeansTrain(embR, "vec_id", "embedding", m = 1, k = 8, iters = 1)
    val assigned = Pq.kmeansAssign(embR, "embedding", cb)
      .select("vec_id", "cluster").as[(Long, Long)].collect()
    val cnts = assigned.groupBy(_._2).view.mapValues(_.length.toDouble).toMap
    val tmax = cnts.values.min
    def ppmBucket(id: Long): Long = {
      val p = 100000007L; val p2 = 99999989L
      ((id % p) * (2654435761L + 67867967L) % p2) * 2246822519L % 1000000L
    }
    val expected = assigned.filter { case (id, c) =>
      ppmBucket(id) < math.floor(1000000.0 * tmax / cnts(c)).toLong
    }.toSet
    assert(out == expected)
    assert(out.nonEmpty)
    // rebalance direction: no sampled cluster exceeds the pre-sample
    // minimum by more than hash-uniformity noise
    val sampled = out.groupBy(_._2).view.mapValues(_.size).toMap
    sampled.foreach { case (c, n) =>
      assert(n <= tmax * 1.5 + 8, s"cluster $c kept $n of target ~$tmax")
    }
  }

  test("semDedup drops scaled re-encodes, keeps originals and singletons") {
    import org.apache.spark.sql.functions.{col, lit, transform}
    val embR = graft.Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding")
    // plant: every vector re-encoded at 1.5x magnitude under a new id
    val scaled = embR.select((col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), x => x * lit(1.5f)).as("embedding"))
    val kept = Pq.semDedup(embR.unionByName(scaled), "vec_id", "embedding",
        k = 8, iters = 1, threshold = 0.999)
      .select("vec_id").as[Long].collect().toSet
    val origIds = embR.select("vec_id").as[Long].collect().toSet
    // every original survives (it is the lowest id on its direction),
    // every copy is pruned (cos(v, 1.5v) ~ 1 >= 0.999, same cluster)
    assert(kept == origIds)
  }

  test("semDedup with no near-dups keeps everything; layout-independent") {
    val embR = graft.Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding")
    val a = Pq.semDedup(embR, "vec_id", "embedding", k = 4, iters = 1)
      .select("vec_id", "cluster").as[(Long, Long)].collect().toSet
    assert(a.map(_._1) == embR.select("vec_id").as[Long].collect().toSet)
    val b = Pq.semDedup(embR.repartition(13), "vec_id", "embedding",
        k = 4, iters = 1)
      .select("vec_id", "cluster").as[(Long, Long)].collect().toSet
    assert(a == b)
  }
}
