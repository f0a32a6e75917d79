package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class NegativeSampleSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val inter = Seq(
    (1L, 3L), (1L, 7L), (1L, 11L),
    (2L, 0L), (2L, 1L)).toDF("user", "item")

  private def candOf(u: Long, j: Int, m: Long, seed: Long): Long = {
    val h = (u % Sample.Prime) * (Sample.Mult + seed + j) %
      Sample.Prime2 * Sample.Mult2
    ((h % m) + m) % m
  }

  test("negatives never collide with positives; at most k per user") {
    val out = Sample.negativeSample(inter, "user", "item",
      nItems = 20L, k = 3, oversample = 4, seed = 5L)
      .as[(Long, Long, Int)].collect()
    val pos = Set((1L, 3L), (1L, 7L), (1L, 11L), (2L, 0L), (2L, 1L))
    assert(out.forall(r => !pos((r._1, r._2))))
    val byUser = out.groupBy(_._1)
    assert(byUser.values.forall(_.length <= 3))
    byUser.values.foreach(rows =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length)))
  }

  test("exactly the portable-hash candidates, earliest probe wins") {
    val out = Sample.negativeSample(inter, "user", "item",
      nItems = 20L, k = 3, oversample = 4, seed = 5L)
      .as[(Long, Long, Int)].collect().filter(_._1 == 1L)
      .sortBy(_._3).map(_._2).toSeq
    // replay: 12 probes, dedup keeping min j, drop positives, first 3
    val pos = Set(3L, 7L, 11L)
    val want = (0 until 12).map(j => (candOf(1L, j, 20L, 5L), j))
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toSeq
      .filter(c => !pos(c._1))
      .sortBy { case (i, j) => (j, i) }.take(3).map(_._1)
    assert(out == want)
  }

  test("reruns are identical; different seeds differ") {
    def run(seed: Long) = Sample.negativeSample(inter, "user", "item",
      nItems = 100L, k = 4, oversample = 3, seed = seed)
      .as[(Long, Long, Int)].collect().toSet
    assert(run(1L) == run(1L))
    assert(run(1L) != run(2L))
  }

  test("itemBase shifts the candidate domain onto 1-based catalogs") {
    // 1-based interactions (TPC-H-style keys): base 1 must (a) never
    // emit the nonexistent id 0, (b) be able to reach id nItems, and
    // (c) be exactly the base-0 run shifted by +1 when the positives
    // shift with it
    val inter0 = Seq((1L, 3L), (1L, 7L), (2L, 0L)).toDF("user", "item")
    val inter1 = inter0.select(col("user"), (col("item") + 1).as("item"))
    val run0 = Sample.negativeSample(inter0, "user", "item",
      nItems = 20L, k = 3, oversample = 4, seed = 5L)
      .as[(Long, Long, Int)].collect().toSet
    val run1 = Sample.negativeSample(inter1, "user", "item",
      nItems = 20L, k = 3, oversample = 4, seed = 5L, itemBase = 1L)
      .as[(Long, Long, Int)].collect().toSet
    assert(run1 == run0.map { case (u, i, p) => (u, i + 1, p) })
    assert(run1.forall { case (_, i, _) => i >= 1L && i <= 20L })
  }

  test("exhausted pool emits FEWER negatives, never a positive") {
    // user 9 interacted with the whole 2-item catalog
    val full = Seq((9L, 0L), (9L, 1L)).toDF("user", "item")
    val out = Sample.negativeSample(full, "user", "item",
      nItems = 2L, k = 2, oversample = 2, seed = 0L)
      .as[(Long, Long, Int)].collect()
    assert(out.isEmpty)
  }
}
