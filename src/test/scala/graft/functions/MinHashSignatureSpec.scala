package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String
import graft.TestSpark

class MinHashSignatureSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Reference implementation of the same formula, in plain Scala. */
  private def expected(shingles: Seq[String], k: Int): Seq[Long] = {
    val (a, b) = MinHashSignature.permConstants(k)
    val mins = Array.fill(k)(Long.MaxValue)
    for (s <- shingles) {
      val h = XXH64.hashUTF8String(UTF8String.fromString(s), MinHashSignature.Seed)
      val hm = ((h % MinHashSignature.P) + MinHashSignature.P) % MinHashSignature.P
      for (i <- 0 until k) {
        val v = (hm * a(i) + b(i)) % MinHashSignature.P
        if (v < mins(i)) mins(i) = v
      }
    }
    mins.toSeq
  }

  test("codegen path matches the reference formula") {
    val df = Seq(Seq("a b c", "b c d"), Seq("x y z")).toDF("sh")
    val out = df.select(MinHashSignature.signature($"sh", 8).as("sig"))
      .as[Seq[Long]].collect()
    assert(out(0) == expected(Seq("a b c", "b c d"), 8))
    assert(out(1) == expected(Seq("x y z"), 8))
  }

  test("interpreted (non-codegen) path agrees with codegen") {
    val df = Seq(Seq("a b c", "b c d")).toDF("sh")
    val withCodegen = df.select(MinHashSignature.signature($"sh", 16))
      .as[Seq[Long]].collect().head
    val prev = spark.conf.getOption("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpreted = df.select(MinHashSignature.signature($"sh", 16))
        .as[Seq[Long]].collect().head
      assert(interpreted == withCodegen)
    } finally prev.foreach(spark.conf.set("spark.sql.codegen.wholeStage", _))
  }

  test("SQL surface: graft_minhash usable from spark.sql") {
    Seq((1L, "the quick brown fox jumps over")).toDF("id", "text")
      .createOrReplaceTempView("mh_docs")
    val out = spark.sql(
      """SELECT id, graft_minhash(split(text, '\\s+'), 4) AS sig
        |FROM mh_docs""".stripMargin)
      .select("sig").as[Seq[Long]].collect().head
    assert(out.length == 4 && out.forall(_ >= 0))
  }

  test("null semantics: null array -> null, null elements skipped") {
    val df = Seq((1, Seq("a", "b")), (2, null: Seq[String]))
      .toDF("id", "sh")
    val out = df.select($"id", MinHashSignature.signature($"sh", 4).as("sig"))
      .orderBy("id").collect()
    assert(out(0).getSeq[Long](1) == expected(Seq("a", "b"), 4))
    assert(out(1).isNullAt(1))
  }
}
