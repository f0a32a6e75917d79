package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String
import graft.TestSpark

class MinHashSignatureSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Reference implementation of the same formula, in plain Scala. */
  private def expected(tokens: Seq[String], k: Int, shingleN: Int): Seq[Long] = {
    val (a, b) = MinHashSignature.permConstants(k)
    val th = tokens.map(t =>
      XXH64.hashUTF8String(UTF8String.fromString(t), MinHashSignature.Seed))
    val n = th.length
    val span = math.min(shingleN, math.max(n, 1))
    val windows = math.max(n - span + 1, if (n > 0) 1 else 0)
    val mins = Array.fill(k)(Long.MaxValue)
    for (w <- 0 until windows) {
      var h = MinHashSignature.Seed
      for (g <- 0 until span if w + g < n) h = XXH64.hashLong(th(w + g), h)
      val hm = ((h % MinHashSignature.P) + MinHashSignature.P) % MinHashSignature.P
      for (i <- 0 until k) {
        val v = (hm * a(i) + b(i)) % MinHashSignature.P
        if (v < mins(i)) mins(i) = v
      }
    }
    mins.toSeq
  }

  test("codegen path matches the reference formula") {
    val df = Seq(Seq("a", "b", "c", "d"), Seq("x", "y")).toDF("toks")
    val out = df.select(MinHashSignature.signature($"toks", 8, 3).as("sig"))
      .as[Seq[Long]].collect()
    assert(out(0) == expected(Seq("a", "b", "c", "d"), 8, 3))
    assert(out(1) == expected(Seq("x", "y"), 8, 3)) // short doc: one window
  }

  test("identical token sequences agree; permuted ones differ") {
    val df = Seq(
      (1L, Seq("w1", "w2", "w3", "w4")),
      (2L, Seq("w1", "w2", "w3", "w4")),
      (3L, Seq("w4", "w3", "w2", "w1"))).toDF("id", "toks")
    val sigs = df.select($"id", MinHashSignature.signature($"toks", 16, 3).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
  }

  test("interpreted (non-codegen) path agrees with codegen") {
    val df = Seq(Seq("a", "b", "c", "d")).toDF("toks")
    val withCodegen = df.select(MinHashSignature.signature($"toks", 16, 3))
      .as[Seq[Long]].collect().head
    val prev = spark.conf.getOption("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpreted = df.select(MinHashSignature.signature($"toks", 16, 3))
        .as[Seq[Long]].collect().head
      assert(interpreted == withCodegen)
    } finally prev.foreach(spark.conf.set("spark.sql.codegen.wholeStage", _))
  }

  test("SQL surface: graft_minhash usable from spark.sql") {
    Seq((1L, "the quick brown fox jumps over")).toDF("id", "text")
      .createOrReplaceTempView("mh_docs")
    val out = spark.sql(
      """SELECT id, graft_minhash(split(text, '\\s+'), 4, 3) AS sig
        |FROM mh_docs""".stripMargin)
      .select("sig").as[Seq[Long]].collect().head
    assert(out.length == 4 && out.forall(_ >= 0))
  }

  test("null semantics: null array -> null") {
    val df = Seq((1, Seq("a", "b")), (2, null: Seq[String]))
      .toDF("id", "toks")
    val out = df.select($"id", MinHashSignature.signature($"toks", 4, 3).as("sig"))
      .orderBy("id").collect()
    assert(out(0).getSeq[Long](1) == expected(Seq("a", "b"), 4, 3))
    assert(out(1).isNullAt(1))
  }
}
