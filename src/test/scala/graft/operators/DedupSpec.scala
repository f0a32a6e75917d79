package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class DedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def frame = Seq(
    // (key, ts, payload)
    (1L, 10L, "old"), (1L, 30L, "new"), (1L, 20L, "mid"),
    (2L, 5L, "only"),
    (3L, 7L, "tie-a"), (3L, 7L, "tie-b")
  ).toDF("id", "ts", "payload")

  test("keepLatest keeps exactly the max-ts row per key") {
    val out = Dedup.keepLatest(frame, Seq("id"), "ts", Seq(col("payload").desc))
      .orderBy("id").collect()
    assert(out.length == 3)
    assert(out(0).getString(2) == "new")
    assert(out(1).getString(2) == "only")
  }

  test("keepLatest tie-break is deterministic via tiebreaker column") {
    val a = Dedup.keepLatest(frame, Seq("id"), "ts", Seq(col("payload").desc))
      .filter($"id" === 3).collect().head.getString(2)
    assert(a == "tie-b") // desc on payload
    val b = Dedup.keepLatest(frame, Seq("id"), "ts", Seq(col("payload").asc))
      .filter($"id" === 3).collect().head.getString(2)
    assert(b == "tie-a")
  }

  test("keepEarliest keeps the min-ts row per key") {
    val out = Dedup.keepEarliest(frame, Seq("id"), "ts", Seq(col("payload").asc))
      .filter($"id" === 1).collect().head
    assert(out.getString(2) == "old")
  }

  test("topKPerKey keeps k rows per key in order") {
    val out = Dedup.topKPerKey(frame, Seq("id"),
      Seq(col("ts").desc, col("payload").asc), 2)
      .orderBy(col("id"), col("ts").desc)
      .select("id", "payload").as[(Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, "new"), (1L, "mid"),
      (2L, "only"),
      (3L, "tie-a"), (3L, "tie-b")))
  }

  test("distinctRows removes full duplicates only") {
    val df = Seq((1, "a"), (1, "a"), (1, "b")).toDF("k", "v")
    assert(Dedup.distinctRows(df).count() == 2)
  }

  test("exactDedup: null position matters — (a,null) != (null,a)") {
    val df = Seq(
      (1L, Some("a"), None: Option[String]),
      (2L, None: Option[String], Some("a")),
      (3L, Some("a"), None: Option[String])
    ).toDF("id", "c1", "c2")
    val groups = Dedup.exactDedupKeepers(df, "id", Seq("c1", "c2")).collect()
    assert(groups.length == 2) // rows 1+3 merge; row 2 stays distinct
    val keepers = Dedup.exactDedup(df, "id", Seq("c1", "c2"))
      .select("id").as[Long].collect().sorted
    assert(keepers.sameElements(Array(1L, 2L)))
  }

  test("exactDedup: separator bytes in values cannot collide columns") {
    val df = Seq((1L, "a b", "c"), (2L, "a", "b c")).toDF("id", "c1", "c2")
    assert(Dedup.exactDedupKeepers(df, "id", Seq("c1", "c2")).count() == 2)
  }

  test("property: keepLatest is input-order-insensitive (union order)") {
    val rows = Seq((1L, 10L, "a"), (1L, 30L, "b"), (2L, 5L, "c"), (2L, 5L, "d"))
    def run(rs: Seq[(Long, Long, String)]) =
      Dedup.keepLatest(rs.toDF("id", "ts", "v"), Seq("id"), "ts",
          Seq(col("v").desc))
        .orderBy("id").collect().map(_.toSeq).toSeq
    val base = run(rows)
    assert(run(rows.reverse) == base)
    assert(run(scala.util.Random.shuffle(rows)) == base)
  }
  test("goldenRecord: each field survives independently from its newest non-null") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-$m%02d-01 00:00:00")
    val feed = Seq(
      // key 1: full v1; partial v2 nulls phone, updates seg
      (1L, "p1", "s1", ts(1)),
      (1L, null, "s2", ts(2)),
      // key 2: newest has the phone, seg only in the oldest
      (2L, null, "sA", ts(1)),
      (2L, "p2", null, ts(3)),
      // key 3: all-null attribute stays null
      (3L, null, null, ts(1))
    ).toDF("k", "phone", "seg", "ts")
    val got = Dedup.goldenRecord(feed, "k", Seq("phone", "seg"), "ts",
        tiebreaks = Seq("k"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getTimestamp(3)))).toMap
    assert(got(1L) == (("p1", "s2", ts(2))))
    assert(got(2L) == (("p2", "sA", ts(3))))
    assert(got(3L) == ((null, null, ts(1))))
    assert(got.size == 3)
  }
}
