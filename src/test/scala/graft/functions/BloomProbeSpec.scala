package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class BloomProbeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Driver-materialized sketch bytes of the given keys — the literal
    * shape the probe is designed for (see BloomProbe scaladoc).
    */
  private def sketchOf(keys: Seq[Long]): Array[Byte] =
    keys.toDF("k").agg(BloomProbe.agg(col("k"), 1000L, 8000L).as("bf"))
      .head.getAs[Array[Byte]](0)

  test("no false negatives; false positives removable by exact check") {
    val members = (1L to 200L).map(_ * 7919L)
    val probes = ((1L to 200L).map(_ * 7919L) ++ (1L to 500L).map(_ * 104729L + 3L))
      .toDF("key")
    val out = probes
      .select(col("key"), BloomProbe.of(sketchOf(members), col("key")).as("maybe"))
      .as[(Long, Boolean)].collect().toMap
    members.foreach(m => assert(out(m), s"member $m must probe true"))
    // a sketch 40 bits/item wide must reject most non-members
    val nonMembers = (1L to 500L).map(_ * 104729L + 3L).filterNot(members.contains)
    assert(nonMembers.count(out(_)) < nonMembers.size / 10)
  }

  test("false (not null) on null key and on null sketch") {
    // an empty build side aggregates to a NULL sketch
    val nullSketch = sketchOf(Seq.empty)
    assert(nullSketch == null)
    val keys = Seq(Some(42L), None).toDF("key")
    val viaNull = keys
      .select(BloomProbe.of(nullSketch, col("key")).as("maybe"))
      .as[Boolean].collect()
    assert(viaNull.toSeq == Seq(false, false))
    val real = keys
      .select(BloomProbe.of(sketchOf(Seq(42L)), col("key")).as("maybe"))
      .as[Boolean].collect().sorted
    assert(real.toSeq == Seq(false, true)) // null key false, member true
  }

  test("interpreted (non-codegen) path agrees with codegen") {
    val probes = (1L to 50L).toDF("key")
    val sk = sketchOf(Seq(5L, 10L, 15L))
    def run() = probes
      .select(col("key"), BloomProbe.of(sk, col("key")).as("maybe"))
      .as[(Long, Boolean)].collect().toMap
    val withCodegen = run()
    val prev = spark.conf.getOption("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(run() == withCodegen)
    finally prev.foreach(spark.conf.set("spark.sql.codegen.wholeStage", _))
  }

  test("a non-foldable sketch expression is rejected at resolution") {
    val df = Seq((Array[Byte](1, 2), 1L)).toDF("bf", "key")
    intercept[Exception] {
      df.select(call_function("graft_bloom_probe", col("bf"), col("key"))).collect()
    }
  }
}
