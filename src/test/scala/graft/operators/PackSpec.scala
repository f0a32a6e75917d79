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

  test("plan shape: pack plans keep their one-exchange budget") {
    // the promised scale shape (Pack scaladoc): ONE shuffle on the
    // shard key — a second exchange would mean the running sum stopped
    // riding the shard partitioning
    graft.audit.PlanGuard.assertMaxExchanges(plan, 1)
    graft.audit.PlanGuard.assertNoCartesian(plan)
    val batches = Pack.lengthBucketBatches(docs, "doc_id",
      size(split(col("text"), " ")).cast("long"), bucketTokens = 16,
      batchSize = 8, nShards = 4)
    graft.audit.PlanGuard.assertMaxExchanges(batches, 1)
  }

  test("every shard is used and sharding is hash-balanced-ish") {
    val counts = plan.groupBy("shard").count().as[(Long, Long)].collect().toMap
    assert(counts.keySet == Set(0L, 1L, 2L, 3L))
    assert(counts.values.min > 30) // 300 docs over 4 shards, no starving
  }

  test("lengthBucketBatches fills batches in id order within a bucket") {
    val out = Pack.lengthBucketBatches(docs, "doc_id",
      size(split(col("text"), " ")).cast("long"),
      bucketTokens = 8, batchSize = 4)
      .select("doc_id", "n_tokens", "len_bucket", "batch_idx")
      .as[(Long, Long, Long, Long)].collect()
    out.groupBy(_._3).foreach { case (bucket, rows) =>
      // every row's length belongs to its bucket
      rows.foreach { case (_, n, b, _) => assert(n / 8 == b) }
      // id order -> batch 0 gets the 4 smallest ids, then batch 1, ...
      val sorted = rows.sortBy(_._1)
      sorted.zipWithIndex.foreach { case ((id, _, _, batch), i) =>
        assert(batch == i / 4, s"bucket=$bucket id=$id")
      }
    }
  }

  test("concatSplit hand case: offsets, sequence ids, and spans") {
    // L=10; docs 4,3,8,10,2 in id order →
    // pre:   0,4,7,15,25
    // seq:   0,0,0, 1, 2
    // off:   0,4,7, 5, 5
    // spans: 1,1,2, 2, 1   (8 crosses 10; 10 runs 15..24 crossing 20)
    val sized = Seq((1L, 4L), (2L, 3L), (3L, 8L), (4L, 10L), (5L, 2L))
      .toDF("id", "n")
    val got = Pack.concatSplit(sized, "id", "n", 10L)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSeq
    assert(got == Seq((1L, 0L, 0L, 1L), (2L, 0L, 4L, 1L),
      (3L, 0L, 7L, 2L), (4L, 1L, 5L, 2L), (5L, 2L, 5L, 1L)))
  }

  test("concatSplit matches sequential reference on random sizes, any layout") {
    val rnd = new scala.util.Random(7)
    val sizes = (1L to 500L).map(i => (i, 1L + rnd.nextInt(40).toLong))
    val df = sizes.toDF("id", "n").repartition(13)
    val got = Pack.concatSplit(df, "id", "n", 64L)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    var pre = 0L
    sizes.foreach { case (id, n) =>
      val seq = pre / 64
      val spans = (pre + n - 1) / 64 - seq + 1
      assert(got(id) == ((seq, pre % 64, spans)), s"doc $id")
      pre += n
    }
  }

  test("concatSplit: zero-token rows are excluded; stats roll up") {
    val sized = Seq((1L, 0L), (2L, 5L), (3L, 0L), (4L, 7L)).toDF("id", "n")
    val assigned = Pack.concatSplit(sized, "id", "n", 8L)
    assert(assigned.count() == 2)
    val stats = Pack.packStats(assigned, "n")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    // doc2 starts seq0 (pre 0), doc4 starts seq0 at off 5, crosses into 1
    assert(stats == Set((0L, 2L, 12L, 1L)))
  }

  test("concatSplit with a custom order column and id tiebreak") {
    val sized = Seq((1L, 4L, 9L), (2L, 3L, 1L), (3L, 2L, 1L))
      .toDF("id", "n", "prio")
    // order by (prio asc, id asc): 2(3), 3(2), 1(4); pre = 0, 3, 5
    val got = Pack.concatSplit(sized, "id", "n", 4L,
        orderCol = Some("prio"))
      .orderBy("id").select("id", "seq_id", "offset_in_seq")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 1L, 1L), (2L, 0L, 0L), (3L, 0L, 3L)))
  }

  test("epochPack == concatSplit over the epoch hash order; epochs differ") {
    val sized = (1L to 200L).map(i => (i, 1L + i % 7)).toDF("id", "n")
    val e1 = Pack.epochPack(sized, "id", "n", 32L, epoch = 1)
    // reference: materialize the epoch key, order by it explicitly
    val exp = Pack.concatSplit(
        sized.withColumn("k", Sample.hashMod2(col("id"), 1000000000L, 1L)),
        "id", "n", 32L, orderCol = Some("k")).drop("k")
    assert(e1.collect().map(_.toSeq).toSet == exp.collect().map(_.toSeq).toSet)
    // a different epoch is a different packing of the same stream:
    // token totals identical, assignment not
    val e2 = Pack.epochPack(sized, "id", "n", 32L, epoch = 2)
    val key = (df: org.apache.spark.sql.DataFrame) => df
      .select("id", "seq_id", "offset_in_seq").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(key(e1) != key(e2))
    // every epoch preserves the stream invariants: offsets in range,
    // per-sequence started tokens fill all but the last sequence
    assert(e2.filter(col("offset_in_seq") < 0 ||
      col("offset_in_seq") >= 32).count() == 0)
    // layout independence: the packing is a pure function of the data
    val relaid = Pack.epochPack(sized.repartition(13), "id", "n", 32L, 1)
    assert(key(relaid) == key(e1))
  }

  test("no batch exceeds batchSize and batches pack densely") {
    val out = Pack.lengthBucketBatches(docs, "doc_id",
      size(split(col("text"), " ")).cast("long"),
      bucketTokens = 8, batchSize = 4, nShards = 2)
      .groupBy("len_bucket", "shard", "batch_idx").count()
      .select("len_bucket", "shard", "batch_idx", "count")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.forall(_._4 <= 4))
    // only the LAST batch of each (bucket, shard) may be partial
    out.groupBy(r => (r._1, r._2)).foreach { case (_, batches) =>
      val maxIdx = batches.map(_._3).max
      batches.filter(_._3 < maxIdx).foreach(b => assert(b._4 == 4, b.toString))
    }
  }
}
