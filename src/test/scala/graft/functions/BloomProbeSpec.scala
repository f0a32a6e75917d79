package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class BloomProbeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** One-row frame carrying a sketch of the given keys. */
  private def sketchOf(keys: Seq[Long]) =
    keys.toDF("k").agg(BloomProbe.agg(col("k"), 1000L, 8000L).as("bf"))

  test("no false negatives; false positives removable by exact check") {
    val members = (1L to 200L).map(_ * 7919L)
    val probes = ((1L to 200L).map(_ * 7919L) ++ (1L to 500L).map(_ * 104729L + 3L))
      .toDF("key")
    val out = probes.join(broadcast(sketchOf(members)))
      .select(col("key"), BloomProbe.of(col("bf"), col("key")).as("maybe"))
      .as[(Long, Boolean)].collect().toMap
    members.foreach(m => assert(out(m), s"member $m must probe true"))
    // a sketch 40 bits/item wide must reject most non-members
    val nonMembers = (1L to 500L).map(_ * 104729L + 3L).filterNot(members.contains)
    assert(nonMembers.count(out(_)) < nonMembers.size / 10)
  }

  test("false (not null) on null key and on null sketch") {
    val nullSketch = Seq.empty[Long].toDF("k")
      .agg(BloomProbe.agg(col("k"), 1000L, 8000L).as("bf"))
    val keys = Seq(Some(42L), None).toDF("key")
    val viaNull = keys.join(broadcast(nullSketch))
      .select(BloomProbe.of(col("bf"), col("key")).as("maybe"))
      .as[Boolean].collect()
    assert(viaNull.toSeq == Seq(false, false))
    val real = keys.join(broadcast(sketchOf(Seq(42L))))
      .select(BloomProbe.of(col("bf"), col("key")).as("maybe"))
      .as[Boolean].collect().sorted
    assert(real.toSeq == Seq(false, true)) // null key false, member true
  }

  test("interpreted (non-codegen) path agrees with codegen") {
    val probes = (1L to 50L).toDF("key")
    def run() = probes.join(broadcast(sketchOf(Seq(5L, 10L, 15L))))
      .select(col("key"), BloomProbe.of(col("bf"), col("key")).as("maybe"))
      .as[(Long, Boolean)].collect().toMap
    val withCodegen = run()
    val prev = spark.conf.getOption("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(run() == withCodegen)
    finally prev.foreach(spark.conf.set("spark.sql.codegen.wholeStage", _))
  }
}
