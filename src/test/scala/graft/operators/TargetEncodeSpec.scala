package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TargetEncodeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("LOO excludes the row's own target; singletons get null + prior") {
    val df = Seq(
      (1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 30.0),
      (4L, "b", 100.0)).toDF("id", "cat", "y")
    val out = TargetEncode.leaveOneOut(df, "id", "cat", "y",
      smoothing = 2.0)
      .collect().map(r => r.getLong(0) -> r).toMap

    // row 1: mean of {20,30} = 25
    assert(out(1L).getDouble(2) == 25.0)
    assert(out(2L).getDouble(2) == 20.0) // {10,30}
    assert(out(3L).getDouble(2) == 15.0) // {10,20}
    // singleton category: LOO undefined
    assert(out(4L).isNullAt(2))

    // smoothed: (cs - y + m·prior) / (cn - 1 + m), prior = 160/4 = 40
    val s1 = (60.0 - 10.0 + 2.0 * 40.0) / (2.0 + 2.0)
    assert(math.abs(out(1L).getDouble(3) - s1) < 1e-12)
    val s4 = (100.0 - 100.0 + 2.0 * 40.0) / (0.0 + 2.0)
    assert(out(4L).getDouble(3) == s4)
  }

  test("plan: category/global dims broadcast, facts never shuffle") {
    val df = (1L to 500L).map(i => (i, s"c${i % 7}", i * 1.0))
      .toDF("id", "cat", "y")
    val out = TargetEncode.leaveOneOut(df, "id", "cat", "y")
    out.collect()
    graft.audit.PlanGuard.assertNoCartesian(out)
    // one exchange for the category aggregate + one single-row reduce;
    // both join back by broadcast
    graft.audit.PlanGuard.assertMaxExchanges(out, 2)
  }

  test("cdfTransform: min-rank ties, exact ppm endpoints, null passthrough") {
    val df = Seq((1L, Some(10.0)), (2L, Some(20.0)), (3L, Some(20.0)),
      (4L, Some(30.0)), (5L, Some(40.0)), (6L, None: Option[Double]))
      .toDF("id", "v")
    val out = TargetEncode.cdfTransform(df, "id", "v")
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    // n = 5 non-null rows; ranks: 10→1, 20→2 (both), 30→4, 40→5
    assert(out(1L) == Some(0L))                       // (1-1)*1M/4
    assert(out(2L) == Some(1000000L / 4))             // (2-1)*1M/4
    assert(out(3L) == Some(1000000L / 4))             // tie shares rank
    assert(out(4L) == Some(3000000L / 4))
    assert(out(5L) == Some(1000000L))                 // max → exactly 1e6
    assert(out(6L).isEmpty)                           // null stays null
  }
}
