package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class TheilSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(String, Double)]) =
    Theil.decomposition(rows.toDF("g", "x"), col("g"), col("x"))
      .as[(Long, Long, Double, Double, Double)].collect().head

  test("perfect equality: between EXACTLY 0, total bounded by dsum grain") {
    // all-equal values: the between term's ratio is a quotient of two
    // exact decimals (share 1 vs population share 1) so it lands on
    // EXACT 0.0; the total rides Σ x·ln x through the DECIMAL(18,6)
    // dsum grain (≤ 5e-7 per term), so its boundary is grain-bounded,
    // not exact — pinned here so the contract is explicit
    val (n, ng, t, b, w) = run(Seq(("a", 5.0), ("a", 5.0),
      ("b", 5.0), ("b", 5.0)))
    assert(n == 4 && ng == 2)
    assert(b == 0.0)
    assert(math.abs(t) < 2e-7 && math.abs(w) < 2e-7)
  }

  test("group means differ, members equal: all inequality is BETWEEN") {
    // a: 2 members of 10; b: 2 members of 30 — within-group T is 0
    val (_, _, t, b, w) = run(Seq(("a", 10.0), ("a", 10.0),
      ("b", 30.0), ("b", 30.0)))
    assert(math.abs(w) < 1e-6)
    assert(math.abs(t - b) < 1e-6 && b > 0.05)
    // hand value: shares 1/4,3/4 of X=80 vs pop shares 1/2,1/2:
    // T_b = 0.25 ln(0.5) + 0.75 ln(1.5)
    val want = 0.25 * math.log(0.5) + 0.75 * math.log(1.5)
    assert(math.abs(b - want) < 1e-6)
  }

  test("identical group profiles: all inequality is WITHIN") {
    // both groups hold {1, 3} — group means equal, so between ~ 0
    val (_, _, t, b, w) = run(Seq(("a", 1.0), ("a", 3.0),
      ("b", 1.0), ("b", 3.0)))
    assert(math.abs(b) < 1e-6)
    assert(math.abs(t - w) < 1e-6)
    val want = 0.25 * math.log(0.5) + 0.75 * math.log(1.5)
    assert(math.abs(t - want) < 1e-5)
  }

  test("non-positive values are excluded from the index") {
    val withJunk = run(Seq(("a", 1.0), ("a", 3.0), ("a", 0.0),
      ("a", -7.0)))
    val clean = run(Seq(("a", 1.0), ("a", 3.0)))
    assert(withJunk._1 == 2 && withJunk._3 == clean._3)
  }
}
