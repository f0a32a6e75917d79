package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class HitsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("authority concentrates on the product bought by every hub") {
    // part 100 bought by all three customers; parts 101/102 by one each
    val edges = Seq((1L, 100L), (2L, 100L), (3L, 100L),
      (1L, 101L), (2L, 102L)).toDF("c", "p")
    val out = Hits.hits(edges, "c", "p", iters = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    // authority(100) dominates; hub(3) (only bought the popular item)
    // trails hubs 1,2 (popular + a niche item)
    assert(out(("authority", 100L)) > out(("authority", 101L)))
    assert(out(("authority", 101L)) == out(("authority", 102L)))
    assert(out(("hub", 1L)) == out(("hub", 2L)))
    assert(out(("hub", 1L)) > out(("hub", 3L)))
    // L1 normalization: each family sums to ~1e6
    val hubs = out.collect { case (("hub", _), s) => s }.sum
    val auths = out.collect { case (("authority", _), s) => s }.sum
    assert(math.abs(hubs - 1e6) < 1e-2 && math.abs(auths - 1e6) < 1e-2)
  }

  test("deep (checkpointed agg) strategy is bit-identical to shallow") {
    // iters=4 crosses DeepIters, so hits() takes the deep path; forcing
    // the window path through hitsOn must give the same scores — the
    // two shapes differ ONLY in plan (totals via window vs agg+cross,
    // checkpoint barriers), never in arithmetic.
    val edges = (1L to 300L).map(i => (i % 17, i % 31)).toDF("c", "p")
    def run(deep: Boolean) = {
      val e = edges.distinct().persist()
      val out = Hits.hitsOn(e, iters = 4, deep = deep)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .sortBy(t => (t._1, t._2)).toSeq
      e.unpersist()
      out
    }
    assert(Hits.DeepIters == 4)
    assert(run(deep = true) == run(deep = false))
  }

  test("strategy gate: deep at depth OR size, shallow only when both small") {
    // the size-vs-depth truth table behind the r12 A/B (COVERAGE.md):
    // the window shape is only allowed when the iteration is shallow
    // AND the larger score side fits a single window task comfortably
    assert(!Hits.chooseDeep(iters = 2, maxSideVertices = 1000L))
    assert(Hits.chooseDeep(iters = Hits.DeepIters, maxSideVertices = 1000L))
    assert(Hits.chooseDeep(iters = 2, maxSideVertices = Hits.DeepVertices + 1))
    assert(!Hits.chooseDeep(iters = 2, maxSideVertices = Hits.DeepVertices))
  }

  test("deterministic across partition layouts") {
    val edges = (1L to 300L).map(i => (i % 17, i % 31)).toDF("c", "p")
    val a = Hits.hits(edges.repartition(13), "c", "p", 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    val b = Hits.hits(edges.coalesce(1), "c", "p", 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(a == b)
  }
}
