package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SampleSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ids = (1L to 10000L).toDF("id")

  test("hashSample keeps roughly the requested fraction, deterministically") {
    val kept = Sample.hashSample(ids, "id", permille = 250).as[Long].collect().toSet
    assert(math.abs(kept.size - 2500) < 250, s"kept ${kept.size}")
    val again = Sample.hashSample(ids.repartition(17), "id", permille = 250)
      .as[Long].collect().toSet
    assert(again == kept)
  }

  test("samples are nested: a 10% sample is a subset of the 30% sample") {
    val p100 = Sample.hashSample(ids, "id", 100).as[Long].collect().toSet
    val p300 = Sample.hashSample(ids, "id", 300).as[Long].collect().toSet
    assert(p100.subsetOf(p300))
  }

  test("mixtureSample hits the target mix at maximal volume") {
    val rows = (1L to 6000L).map { i =>
      (i, if (i % 6 < 3) "a" else if (i % 6 < 5) "b" else "c")
    }.toDF("id", "stratum") // counts: a=3000, b=2000, c=1000
    val out = Sample.mixtureSample(rows, "id", "stratum",
      Map("a" -> 0.5, "b" -> 0.25, "c" -> 0.25))
      .groupBy("stratum").count().as[(String, Long)].collect().toMap
    // c is the binding stratum: T = 1000/0.25 = 4000 -> targets
    // a=2000, b=1000, c=1000 (c keeps everything)
    assert(out("c") > 900)
    assert(math.abs(out("a") - 2000) < 200, out.toString)
    assert(math.abs(out("b") - 1000) < 150, out.toString)
  }

  test("mixtureSample drops strata without a weight") {
    val rows = Seq((1L, "a"), (2L, "junk"), (3L, "a")).toDF("id", "stratum")
    val kept = Sample.mixtureSample(rows, "id", "stratum", Map("a" -> 1.0))
      .select("stratum").as[String].collect()
    assert(!kept.contains("junk"))
  }

  test("hashSplit is exhaustive, disjoint, near the target shares, and stable") {
    val ids = (1L to 10000L).toDF("id")
    val out = Sample.hashSplit(ids, "id",
      Seq("train" -> 800, "val" -> 100, "test" -> 100))
    val counts = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 10000L)               // exhaustive, one label each
    assert(math.abs(counts("train") - 8000) < 400, counts.toString)
    assert(math.abs(counts("val") - 1000) < 200, counts.toString)
    assert(math.abs(counts("test") - 1000) < 200, counts.toString)
    // rebuild-stable: the same id lands in the same split on a repartition
    val a = out.orderBy("id").collect().toSeq
    val b = Sample.hashSplit(ids.repartition(7), "id",
      Seq("train" -> 800, "val" -> 100, "test" -> 100)).orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("hashSplit stratifies independently of hashSample's bucket") {
    // with an UNseeded split this would put the whole sample in train
    val ids = (1L to 20000L).toDF("id")
    val sampled = Sample.hashSample(ids, "id", 100) // 10% by the raw bucket
    val counts = Sample.hashSplit(sampled, "id",
      Seq("train" -> 800, "val" -> 100, "test" -> 100))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    val n = counts.values.sum.toDouble
    assert(counts.getOrElse("val", 0L) > 0 && counts.getOrElse("test", 0L) > 0)
    assert(math.abs(counts("train") / n - 0.8) < 0.08, counts.toString)
  }

  test("hashSplit rejects shares that do not sum to 1000") {
    val ids = Seq(1L).toDF("id")
    intercept[IllegalArgumentException] {
      Sample.hashSplit(ids, "id", Seq("train" -> 900, "val" -> 99))
    }
  }
}
