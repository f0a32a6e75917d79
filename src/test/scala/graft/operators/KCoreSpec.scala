package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class KCoreSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // K4 core {1,2,3,4} with a pendant chain 4-5-6 and a triangle
  // {10,11,12} hanging off node 1 via 1-10
  private def edges = ((for {
    i <- 1 to 4; j <- (i + 1) to 4
  } yield (i.toLong, j.toLong)) ++
    Seq((4L, 5L), (5L, 6L), (1L, 10L),
      (10L, 11L), (11L, 12L), (10L, 12L))).toDF("x", "y")

  test("3-core strips chains and triangles, keeps K4 at fixpoint") {
    val out = KCore.kCore(edges, "x", "y", k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("2-core keeps K4 + the triangle, strips the chain") {
    val out = KCore.kCore(edges, "x", "y", k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // chain 4-5-6 peels (5,6 go; 4 stays via K4); bridge 1-10 remains
    // an edge between two 2-cores? No: after peeling, deg(1)=4 incl.
    // the bridge, deg(10)=3 — the bridge survives because both ends
    // keep degree >= 2
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 10L, 11L, 12L))
    assert(out(1L) == 4L && out(10L) == 3L && out(11L) == 2L)
  }

  test("fixed-round truncation matches the synchronous peel trace") {
    // path graph 1-2-3-4-5: synchronous 1-core? use k=2: round 1
    // removes 1,5; round 2 removes 2,4; round 3 removes 3 (deg 0 < 2
    // means node drops out of the edge set entirely)
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("x", "y")
    val r1 = KCore.kCore(path, "x", "y", k = 2, maxRounds = 1,
      toFixpoint = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // after one peel: edges among {2,3,4} = 2-3, 3-4
    assert(r1 == Map(2L -> 1L, 3L -> 2L, 4L -> 1L))
    val r2 = KCore.kCore(path, "x", "y", k = 2, maxRounds = 2,
      toFixpoint = false).count()
    // round 2 keeps only node 3 (degree 2), edges among {3} = none
    assert(r2 == 0)
  }
}
