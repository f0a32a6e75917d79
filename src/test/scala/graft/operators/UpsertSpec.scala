package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class UpsertSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def current = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("id", "name", "v")
  private def updates = Seq((2L, "B", 99.0), (4L, "d", 40.0))
    .toDF("id", "name", "v")

  test("merge replaces matched keys and appends new ones") {
    val out = Upsert.merge(current, updates, Seq("id"))
      .orderBy("id").as[(Long, String, Double)].collect()
    assert(out.toSeq == Seq(
      (1L, "a", 10.0), (2L, "B", 99.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("merge is idempotent: f(f(x)) == f(x)") {
    val once = Upsert.merge(current, updates, Seq("id"))
    val twice = Upsert.merge(once, updates, Seq("id"))
    assert(once.orderBy("id").collect().toSeq ==
      twice.orderBy("id").collect().toSeq)
  }

  test("mergeEvolving null-fills schema drift on either side") {
    val widened = Seq((5L, "e", 1.0, "extra")).toDF("id", "name", "v", "note")
    val out = Upsert.mergeEvolving(current, widened, Seq("id"))
    assert(out.columns.toSet == Set("id", "name", "v", "note"))
    assert(out.filter($"id" === 1 && $"note".isNull).count() == 1)
    assert(out.filter($"id" === 5 && $"note" === "extra").count() == 1)
  }

  test("upsertByDate replaces only the dates present in the delta") {
    val mart = Seq(("2024-01-01", 10L), ("2024-01-02", 20L)).toDF("date", "kpi")
    val daily = Seq(("2024-01-02", 99L), ("2024-01-03", 30L)).toDF("date", "kpi")
    val out = Upsert.upsertByDate(mart, daily, "date")
      .orderBy("date").as[(String, Long)].collect()
    assert(out.toSeq == Seq(
      ("2024-01-01", 10L), ("2024-01-02", 99L), ("2024-01-03", 30L)))
  }
}
