package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TrianglesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("K4 + pendant triangle + star count exactly") {
    // K4 over {1,2,3,4}: 4 triangles, each node in 3.
    // Triangle {10,11,12}: each node in 1.
    // Star hub 20 with leaves 21-24: no triangles.
    val edges = (for {
      i <- 1 to 4; j <- (i + 1) to 4
    } yield (i.toLong, j.toLong)) ++
      Seq((10L, 11L), (11L, 12L), (10L, 12L)) ++
      (21 to 24).map(l => (20L, l.toLong))
    val out = Triangles.perNodeCounts(edges.toDF("x", "y"), "x", "y")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L,
      10L -> 1L, 11L -> 1L, 12L -> 1L))
  }

  test("duplicate rows, reversed orientations, self-loops are cleaned") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (1L, 3L),
      (3L, 3L)).toDF("x", "y")
    val out = Triangles.perNodeCounts(edges, "x", "y")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("matches brute force on a pseudo-random graph") {
    val rnd = new scala.util.Random(7)
    val edges = (1 to 300).map(_ =>
      (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }
    val out = Triangles.perNodeCounts(edges.toDF("x", "y"), "x", "y")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toSet
    val nodes = und.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
    val expected = scala.collection.mutable.Map[Long, Long]()
    for {
      i <- nodes; j <- nodes if j > i; k <- nodes if k > j
      if und((i, j)) && und((j, k)) && und((i, k))
    } Seq(i, j, k).foreach(n =>
      expected(n) = expected.getOrElse(n, 0L) + 1L)
    assert(out == expected.toMap)
  }
}
