package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class LabelPropagationSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("two bridged triangles settle into two communities (hand-traced)") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L)).toDF("x", "y")
    val out = LabelPropagation.propagate(edges, "x", "y", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // synchronous rounds with min-label ties, traced by hand:
    // r1: 1→2 2→1 3→1 10→3 11→10 12→10
    // r2: 1→1 2→1 3→1 10→10 11→3 12→3
    // r3: 1→1 2→1 3→1 10→3 11→3 12→3
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 3L, 11L -> 3L, 12L -> 3L))
  }

  test("propagation is deterministic across partition layouts") {
    val edges = (1L to 60L).map(i => (i, i % 20 + 100L)).toDF("x", "y")
    val a = LabelPropagation.propagate(edges.repartition(7), "x", "y", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = LabelPropagation.propagate(edges.coalesce(1), "x", "y", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
  }
}
