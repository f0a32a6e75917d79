package graft.gold

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import graft.TestSpark

class RfmSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def t(day: Int): Timestamp =
    Timestamp.valueOf(f"2024-03-$day%02d 12:00:00")

  // 5 customers with cleanly separated recency/frequency/monetary
  private def orders = Seq(
    // cust 1: recent, frequent, big spender → champion
    (1L, t(20), 100.0), (1L, t(21), 100.0), (1L, t(22), 100.0),
    (1L, t(23), 100.0), (1L, t(24), 100.0),
    // cust 2: recent, infrequent
    (2L, t(23), 80.0),
    // cust 3: middling
    (3L, t(15), 60.0), (3L, t(16), 60.0),
    // cust 4: old, frequent
    (4L, t(1), 40.0), (4L, t(2), 40.0), (4L, t(3), 40.0), (4L, t(4), 40.0),
    // cust 5: old, one small order → hibernating
    (5L, t(2), 5.0)
  ).toDF("cust", "odate", "total")

  test("quintile scores and segments are exact integer rank math") {
    val out = Gold.rfmSegments(orders, "cust", "odate", "total")
      .collect().map(r => r.getLong(0) -> r).toMap

    // recency ranks (days before max=24): c1=0, c2=1, c3=8, c4=20, c5=22
    // → rank order 1,2,3,4,5 over n=5 → r_scores 5,4,3,2,1
    assert(out(1L).getAs[Long]("r_score") == 5)
    assert(out(2L).getAs[Long]("r_score") == 4)
    assert(out(3L).getAs[Long]("r_score") == 3)
    assert(out(4L).getAs[Long]("r_score") == 2)
    assert(out(5L).getAs[Long]("r_score") == 1)

    // frequency: c1=5, c4=4, c3=2, then c2=c5=1 (tie → custkey order)
    assert(out(1L).getAs[Long]("f_score") == 5)
    assert(out(4L).getAs[Long]("f_score") == 4)
    assert(out(3L).getAs[Long]("f_score") == 3)
    assert(out(2L).getAs[Long]("f_score") == 2)
    assert(out(5L).getAs[Long]("f_score") == 1)

    // monetary: c1=500 > c4=160 > c3=120 > c2=80 > c5=5
    assert(out(1L).getAs[Long]("m_score") == 5)
    assert(out(4L).getAs[Long]("m_score") == 4)
    assert(out(5L).getAs[Long]("m_score") == 1)

    assert(out(1L).getAs[String]("segment") == "champion")
    assert(out(2L).getAs[String]("segment") == "recent")
    assert(out(4L).getAs[String]("segment") == "at_risk")
    assert(out(5L).getAs[String]("segment") == "hibernating")
    assert(out(3L).getAs[String]("segment") == "regular")

    assert(out(1L).getAs[Long]("recency_days") == 0L)
    assert(out(5L).getAs[Long]("recency_days") == 22L)
    assert(out(1L).getAs[Double]("monetary") == 500.0)
  }

  test("plan shape: ranks hash-distribute by bucket, no single-partition " +
    "window over customers") {
    val out = Gold.rfmSegments(orders, "cust", "odate", "total")
    out.collect()
    graft.audit.PlanGuard.assertNoCartesian(out)
    // The r9 shape shared ONE single-partition exchange across three
    // global rank windows — 2 exchanges total, but every customer row
    // through one task. The Ranks rewrite trades that for more (cheap,
    // narrow) exchanges: per quintile a bucket-hash window exchange +
    // tiny aggregate subtrees. Pin the property that matters — every
    // rank window partitions by the bucket column, and NO window over
    // the customer rollup runs on a single partition.
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(__b"),
      s"rank windows must hash-distribute by bucket:\n${plan.take(2000)}")
    val rankWindows = plan.linesIterator
      .filter(l => l.contains("Window") && l.contains("row_number()"))
      .toSeq
    assert(rankWindows.nonEmpty &&
      rankWindows.forall(_.contains("windowspecdefinition(__b")),
      s"a rank window is not bucket-partitioned:\n${rankWindows.mkString("\n")}")
  }
}
