package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class PackSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val ctx = 128

  private def docs = (1L to 300L).map(i => (i, s"doc $i " + ("w " * (i % 37).toInt).trim))
    .toDF("doc_id", "text")

  private def plan = Pack.packPlan(docs, "doc_id",
    size(split(col("text"), " ")).cast("long"), nShards = 4, ctxTokens = ctx)

  test("offsets are in [0, ctx) and packs fill sequentially per shard") {
    val rows = plan.select("shard", "n_tokens", "pack_seq", "pack_offset")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, seq, off) =>
      assert(off >= 0 && off < ctx)
      assert(seq >= 0)
    }
    // per shard: doc starts are exactly the running sum of predecessors
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val starts = rs.map { case (_, n, seq, off) => (seq * ctx + off, n) }
        .sortBy(_._1)
      starts.zip(starts.scanLeft(0L)(_ + _._2)).foreach {
        case ((start, _), expected) => assert(start == expected)
      }
    }
  }

  test("the plan is invariant to input partitioning") {
    val base = plan.orderBy("doc_id").collect().toSeq
    val shuffled = Pack.packPlan(docs.repartition(13), "doc_id",
      size(split(col("text"), " ")).cast("long"), nShards = 4, ctxTokens = ctx)
      .orderBy("doc_id").collect().toSeq
    assert(base == shuffled)
  }

  test("every shard is used and sharding is hash-balanced-ish") {
    val counts = plan.groupBy("shard").count().as[(Long, Long)].collect().toMap
    assert(counts.keySet == Set(0L, 1L, 2L, 3L))
    assert(counts.values.min > 30) // 300 docs over 4 shards, no starving
  }
}
