package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class WassersteinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def w1Of(a: Seq[Double], b: Seq[Double]) =
    Quality.wasserstein1D(a.toDF("v"), b.toDF("v"), "v")
      .as[(Option[Double], Long, Long, Long)].collect().head

  test("hand-worked: unit shift of a two-point distribution costs 1") {
    // a={0,1}, b={1,2}: |F gap| is 1/2 on [0,1) and 1/2 on [1,2)
    val (w1, nv, na, nb) = w1Of(Seq(0.0, 1.0), Seq(1.0, 2.0))
    assert(w1.contains(1.0) && nv == 3 && na == 2 && nb == 2)
  }

  test("pure translation: W1 equals the shift, regardless of shape") {
    val a = (0 until 10).map(_.toDouble)
    val (w1, _, _, _) = w1Of(a, a.map(_ + 5.0))
    assert(w1.exists(x => math.abs(x - 5.0) < 1e-6))
  }

  test("identical distributions score 0; different multiplicities don't") {
    val a = Seq(1.0, 2.0, 2.0, 7.0)
    assert(w1Of(a, a)._1.contains(0.0))
    // b doubles the mass at 7: CDFs diverge even on the same support
    val (w1, _, _, _) = w1Of(a, Seq(1.0, 2.0, 7.0, 7.0))
    assert(w1.exists(_ > 0.0))
  }

  test("degenerate supports: one shared value -> 0; empty side -> NULL") {
    val (w1s, nv, _, _) = w1Of(Seq(3.0, 3.0), Seq(3.0))
    assert(w1s.contains(0.0) && nv == 1)
    val (w1e, _, na, nb) = w1Of(Seq(1.0, 2.0), Seq.empty[Double])
    assert(w1e.isEmpty && na == 2 && nb == 0)
  }

  test("weighted mass: duplicated values act as multiplicity") {
    // a: mass 3/4 at 0, 1/4 at 4; b: all mass at 4
    // |F gap| = 3/4 over [0,4) -> W1 = 3
    val (w1, _, _, _) = w1Of(Seq(0.0, 0.0, 0.0, 4.0),
      Seq(4.0, 4.0, 4.0, 4.0))
    assert(w1.exists(x => math.abs(x - 3.0) < 1e-6))
  }
}
