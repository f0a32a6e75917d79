package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class RollingHashSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** The HOF formulation the native expression replaced — kept as the
    * reference so drift between the two would fail here.
    */
  private def hofHash(text: org.apache.spark.sql.Column) =
    aggregate(
      transform(split(text, ""), c => ascii(c).cast("long")),
      lit(0L),
      (acc, x) => (acc * 31L + x) % 1000000007L)

  test("matches the HOF formulation on ASCII text, including empty") {
    val docs = Seq("the quick brown fox", "a", "", "punct! and, digits 123",
      "  leading and trailing  ", "x" * 500)
    val df = docs.toDF("text")
    val rows = df.select(RollingHash.of($"text").as("native"),
      hofHash($"text").as("hof")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("plain-Scala fold agrees with the column expression") {
    val docs = Seq("hello world", "", "abc")
    val out = docs.toDF("text").select(RollingHash.of($"text")).as[Long].collect()
    assert(out.toSeq == docs.map(RollingHash.hash))
  }

  test("interpreted (non-codegen) path agrees with codegen") {
    val df = Seq("interpreted vs codegen parity").toDF("text")
    val withCodegen = df.select(RollingHash.of($"text")).as[Long].collect().head
    val prev = spark.conf.getOption("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpreted = df.select(RollingHash.of($"text")).as[Long].collect().head
      assert(interpreted == withCodegen)
    } finally prev.foreach(spark.conf.set("spark.sql.codegen.wholeStage", _))
  }

  test("null -> null; order-sensitive") {
    val df = Seq((1, "ab c"), (2, "ba c"), (3, null: String)).toDF("id", "text")
    val out = df.select($"id", RollingHash.of($"text").as("h")).orderBy("id").collect()
    assert(out(0).getLong(1) != out(1).getLong(1))
    assert(out(2).isNullAt(1))
  }

  test("code-point iteration: supplementary chars count once") {
    // U+1F600 is one code point but two UTF-16 chars; the fold must add
    // 0x1F600 once, exactly like split-by-"" + ascii does.
    val s = "a😀b"
    val expected = Seq('a'.toLong, 0x1F600L, 'b'.toLong)
      .foldLeft(0L)((acc, cp) => (acc * 31L + cp) % 1000000007L)
    assert(RollingHash.hash(s) == expected)
    val viaHof = Seq(s).toDF("text").select(hofHash($"text")).as[Long].collect().head
    assert(viaHof == expected)
  }
}
