package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class PortableSimHashSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Reference implementation of the same formula, in plain Scala. */
  private def expected(tokens: Seq[String]): Long = {
    import PortableSimHash._
    val votes = new Array[Int](Bits)
    tokens.foreach { t =>
      val h = RollingHash.hash(t)
      val h1 = (A1 * h + B1) % Mod
      val h2 = (A2 * h + B2) % Mod
      for (i <- 0 until Half) {
        votes(i) += (if (((h1 >> i) & 1L) == 1L) 1 else -1)
        votes(Half + i) += (if (((h2 >> i) & 1L) == 1L) 1 else -1)
      }
    }
    (0 until Bits).map(i => if (votes(i) > 0) 1L << i else 0L).sum
  }

  test("codegen path matches the reference formula; empty array -> 0") {
    val df = Seq(Seq("a", "b", "c"), Seq("hello"), Seq.empty[String])
      .toDF("toks")
    val out = df.select(PortableSimHash.simhash($"toks").as("s"))
      .as[Long].collect()
    assert(out(0) == expected(Seq("a", "b", "c")))
    assert(out(1) == expected(Seq("hello")))
    assert(out(2) == 0L) // all votes 0 → all bits 0
    assert((out(0) >>> 60) == 0L) // only the low 60 bits are used
  }

  test("interpreted (non-codegen) path agrees with codegen") {
    val df = Seq(Seq("x", "y", "z", "x")).toDF("toks")
    val withCodegen = df.select(PortableSimHash.simhash($"toks"))
      .as[Long].collect().head
    val prev = spark.conf.getOption("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpreted = df.select(PortableSimHash.simhash($"toks"))
        .as[Long].collect().head
      assert(withCodegen == interpreted)
    } finally prev.foreach(spark.conf.set("spark.sql.codegen.wholeStage", _))
  }

  test("constants are PortableMinHash's i=0,1 recipe") {
    val (a, b) = PortableMinHash.constants(2)
    assert(PortableSimHash.A1 == a(0) && PortableSimHash.B1 == b(0))
    assert(PortableSimHash.A2 == a(1) && PortableSimHash.B2 == b(1))
  }

  test("blocked pairs at bits=60 equal brute-force Hamming <= 3") {
    val corpus = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val sigs = graft.dedup.NearDup.simhashPortable(corpus, "doc_id", "text")
      .persist()
    val got = graft.dedup.NearDup.simhashPairs(sigs, "doc_id",
        maxHamming = 3, blocks = 4, bits = 60)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val all = sigs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val exp = (for {
      (i1, s1) <- all; (i2, s2) <- all if i1 < i2
      if java.lang.Long.bitCount(s1 ^ s2) <= 3
    } yield (i1, i2)).toSet
    sigs.unpersist()
    assert(got == exp && got.nonEmpty)
  }
}
