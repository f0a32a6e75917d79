package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class JsdSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def run(a: Seq[String], b: Seq[String]) =
    Vocab.jsDivergence(a.toDF("text"), b.toDF("text"), "text")
      .as[(Option[Double], Long, Long, Long)].collect().head

  test("identical corpora score 0; disjoint corpora score ln 2") {
    val same = run(Seq("a b c", "a b"), Seq("a b c", "a b"))
    assert(same._1.contains(0.0) && same._2 == 5 && same._3 == 5)
    val disjoint = run(Seq("x x y"), Seq("p q q"))
    assert(disjoint._1.exists(j => math.abs(j - math.log(2.0)) < 1e-5))
    assert(disjoint._4 == 4)
  }

  test("hand-worked asymmetric overlap") {
    // a = {x: 1}, b = {x: 1/2, y: 1/2}; m(x) = 3/4, m(y) = 1/4
    // JSD = 0.5[1·ln(4/3)] + 0.5[0.5·ln(2/3) + 0.5·ln 2]
    val want = 0.5 * math.log(4.0 / 3.0) +
      0.5 * (0.5 * math.log(2.0 / 3.0) + 0.5 * math.log(2.0))
    val got = run(Seq("x x"), Seq("x y"))
    assert(got._1.exists(j => math.abs(j - want) < 1e-5))
  }

  test("symmetry and the ln 2 bound") {
    val ab = run(Seq("a a b c"), Seq("b c c d"))
    val ba = run(Seq("b c c d"), Seq("a a b c"))
    assert(ab._1 == ba._1)
    assert(ab._1.exists(j => j > 0.0 && j < math.log(2.0)))
  }

  test("an empty side yields NULL, never NaN or a divide error") {
    val r = run(Seq("a b"), Seq.empty[String])
    assert(r._1.isEmpty && r._2 == 2 && r._3 == 0)
  }
}
