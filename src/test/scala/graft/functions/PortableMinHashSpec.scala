package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class PortableMinHashSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Reference implementation of the same formula, in plain Scala. */
  private def expected(tokens: Seq[String], k: Int, shingleN: Int): Seq[Long] = {
    val (a, b) = PortableMinHash.constants(k)
    val m = PortableMinHash.Mod
    val th = tokens.map(RollingHash.hash)
    val windows = th.length - shingleN + 1
    if (windows <= 0) return Seq.empty
    val mins = Array.fill(k)(Long.MaxValue)
    for (w <- 0 until windows) {
      var s = 0L
      for (g <- 0 until shingleN) s = (s * 31L + th(w + g)) % m
      for (i <- 0 until k) {
        val v = (a(i) * s + b(i)) % m
        if (v < mins(i)) mins(i) = v
      }
    }
    mins.toSeq
  }

  test("codegen path matches the reference formula; short docs empty") {
    val df = Seq(Seq("a", "b", "c", "d"), Seq("x", "y")).toDF("toks")
    val out = df.select(PortableMinHash.minima($"toks", 8, 3).as("sig"))
      .as[Seq[Long]].collect()
    assert(out(0) == expected(Seq("a", "b", "c", "d"), 8, 3))
    assert(out(1) == Seq.empty) // < shingleN tokens → no shingles
  }

  test("interpreted (non-codegen) path agrees with codegen") {
    val df = Seq(Seq("a", "b", "c", "d", "e")).toDF("toks")
    val withCodegen = df.select(PortableMinHash.minima($"toks", 16, 3))
      .as[Seq[Long]].collect().head
    val prev = spark.conf.getOption("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpreted = df.select(PortableMinHash.minima($"toks", 16, 3))
        .as[Seq[Long]].collect().head
      assert(withCodegen == interpreted)
    } finally prev.foreach(spark.conf.set("spark.sql.codegen.wholeStage", _))
  }

  test("constants equal the NearDup recipe the oracles replay") {
    val (a, b) = PortableMinHash.constants(16)
    for (i <- 0 until 16) {
      assert(a(i) == graft.dedup.NearDup.portableA(i))
      assert(b(i) == graft.dedup.NearDup.portableB(i))
    }
    assert(PortableMinHash.Mod == graft.dedup.NearDup.PortableMod)
  }
}
