package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SaltSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("saltedAgg equals the unsalted aggregation on a skewed key") {
    // hot key: 10k rows for user 1, a handful for others
    val df = ((1 to 10000).map(i => (1L, i.toDouble)) ++
      Seq((2L, 5.0), (2L, 7.0), (3L, 1.0))).toDF("user_id", "v")
    val salted = Salt.saltedAgg(df, Seq("user_id"), saltBuckets = 8, Map(
      "total" -> (col("v"), "sum"),
      "cnt" -> (col("v"), "count"),
      "vmin" -> (col("v"), "min"),
      "vmax" -> (col("v"), "max")))
    val plain = df.groupBy("user_id").agg(
      sum($"v").as("total"), count($"v").as("cnt"),
      min($"v").as("vmin"), max($"v").as("vmax"))
    val s = salted.orderBy("user_id").collect().map(_.toSeq)
    val p = plain.orderBy("user_id").collect().map(_.toSeq)
    assert(s.toSeq == p.toSeq)
  }

  test("plan shape: salted paths keep their exchange budgets, no cartesian") {
    val fact = ((1 to 5000).map(i => (1L, i.toLong)) ++
      Seq((2L, 1L), (3L, 2L))).toDF("user_id", "v")
    val dim = Seq((1L, "gold"), (2L, "silver"), (3L, "bronze"))
      .toDF("user_id", "tier")
    // two-phase agg = exactly two exchanges: (keys, salt) then keys
    val agg = Salt.saltedAgg(fact, Seq("user_id"), saltBuckets = 8,
      Map("total" -> (col("v"), "sum")))
    graft.audit.PlanGuard.assertMaxExchanges(agg, 2)
    graft.audit.PlanGuard.assertNoCartesian(agg)
    // the replicate-the-other-side join must stay an equi-join on
    // (keys, salt) — a cartesian here would mean the salt key fell out
    // of the join condition; one exchange per side at most
    val joined = Salt.saltedJoin(fact, dim, Seq("user_id"), saltBuckets = 8)
    graft.audit.PlanGuard.assertMaxExchanges(joined, 2)
    graft.audit.PlanGuard.assertNoCartesian(joined)
  }

  test("saltedJoin equals the plain join on a skewed key (inner + left)") {
    // hot key 1 dominates the fact side; key 9 matches nothing
    val fact = ((1 to 5000).map(i => (1L, i.toLong)) ++
      Seq((2L, -1L), (3L, -2L), (9L, -3L))).toDF("k", "payload")
    val dim = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "attr")
    for (jt <- Seq("inner", "left")) {
      val salted = Salt.saltedJoin(fact, dim, Seq("k"), saltBuckets = 8, jt)
        .orderBy("k", "payload").collect().map(_.toSeq)
      val plain = fact.join(dim, Seq("k"), jt)
        .orderBy("k", "payload").collect().map(_.toSeq)
      assert(salted.toSeq == plain.toSeq, s"joinType=$jt")
    }
  }

  test("saltedJoin matches plain join on null keys and duplicate fact rows") {
    val fact = Seq((Option(1L), "p1"), (Option(1L), "p1"), // exact dupe row
      (None, "p2"), (Option(2L), "p3")).toDF("k", "payload")
    val dim = Seq((1L, "a"), (2L, "b")).toDF("k", "attr")
    for (jt <- Seq("inner", "left")) {
      val salted = Salt.saltedJoin(fact, dim, Seq("k"), saltBuckets = 4, jt)
        .orderBy("k", "payload").collect().map(_.toSeq)
      val plain = fact.join(dim, Seq("k"), jt)
        .orderBy("k", "payload").collect().map(_.toSeq)
      assert(salted.toSeq == plain.toSeq, s"joinType=$jt")
    }
  }

  test("saltedJoin rejects right/full joins and keeps no salt column") {
    val df = Seq((1L, "x")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Salt.saltedJoin(df, df, Seq("k"), 4, "right")
    }
    val out = Salt.saltedJoin(df, Seq((1L, "y")).toDF("k", "w"), Seq("k"), 4)
    assert(out.columns.toSeq == Seq("k", "v", "w"))
  }

  test("approx_count_distinct lands within 2% of exact on testdata") {
    val ev = graft.Tables.t(spark, "/root/testdata/sf0.01", "events")
    val r = ev.agg(
      approx_count_distinct("user_id").as("approx"),
      countDistinct(col("user_id")).as("exact")).collect().head
    val (approx, exact) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.02, s"approx=$approx exact=$exact")
  }
}
