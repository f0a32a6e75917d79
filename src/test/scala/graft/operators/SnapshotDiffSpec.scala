package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SnapshotDiffSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("classifies inserts, deletes, updates; drops unchanged; null-safe") {
    val oldDf = Seq(
      (1L, Some("a"), 10.0), // unchanged
      (2L, Some("b"), 20.0), // update: value change
      (3L, None: Option[String], 30.0), // update: null -> value
      (4L, Some("d"), 40.0)  // delete
    ).toDF("id", "name", "bal")
    val newDf = Seq(
      (1L, Some("a"), 10.0),
      (2L, Some("b"), 25.0),
      (3L, Some("c"), 30.0),
      (5L, Some("e"), 50.0)  // insert
    ).toDF("id", "name", "bal")
    val out = SnapshotDiff.snapshotDiff(oldDf, newDf, Seq("id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(2L -> "update", 3L -> "update",
      4L -> "delete", 5L -> "insert"))

    val rows = SnapshotDiff.snapshotDiff(oldDf, newDf, Seq("id"))
      .collect().map(r => r.getLong(0) -> r).toMap
    // delete carries only old_, insert only new_
    assert(rows(4L).isNullAt(rows(4L).fieldIndex("new_name")))
    assert(rows(5L).isNullAt(rows(5L).fieldIndex("old_name")))
    assert(rows(2L).getDouble(rows(2L).fieldIndex("old_bal")) == 20.0)
    assert(rows(2L).getDouble(rows(2L).fieldIndex("new_bal")) == 25.0)
  }

  test("diff of identical snapshots is empty; plan is one join, no cartesian") {
    val df = (1L to 100L).map(i => (i, s"n$i", i * 1.5)).toDF("id", "n", "v")
    val out = SnapshotDiff.snapshotDiff(df, df, Seq("id"))
    assert(out.count() == 0)
    out.collect()
    graft.audit.PlanGuard.assertNoCartesian(out)
    graft.audit.PlanGuard.assertMaxExchanges(out, 2)
  }
}
