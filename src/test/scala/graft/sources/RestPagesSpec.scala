package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.TestSpark

/** File-backed fetcher that fails the FIRST attempt per URL — proves
  * the per-partition retry path without a network. Executor-visible
  * state works because tests run local (one JVM).
  */
class FlakyFileFetcher extends PageFetcher {
  override def fetch(url: String): String = {
    val first = FlakyFileFetcher.seen.putIfAbsent(url, true) == null
    FlakyFileFetcher.attempts.incrementAndGet()
    if (first) sys.error(s"transient fault on $url")
    new UrlFetcher().fetch(url)
  }
}
object FlakyFileFetcher {
  val seen = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
  val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
}

class RestPagesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Stage page files: 10 + 10 + 5 records, then empty pages. */
  private def stagePages(): String = {
    val dir = java.nio.file.Files.createTempDirectory("rest_pages")
    def rec(i: Int) =
      s"""{"id":$i,"name":"item$i","rating":{"rate":${i % 5}.5,"count":$i}}"""
    def write(page: Int, ids: Range): Unit =
      java.nio.file.Files.writeString(dir.resolve(s"page$page.json"),
        ids.map(rec).mkString("[", ",", "]"))
    write(0, 0 until 10)
    write(1, 10 until 20)
    write(2, 20 until 25) // short page
    java.nio.file.Files.writeString(dir.resolve("page3.json"), "[]")
    java.nio.file.Files.writeString(dir.resolve("page4.json"), "[]")
    dir.toString
  }

  test("N pages read as N partitions with an inferred nested schema") {
    val dir = stagePages()
    val df = spark.read.format("graft-rest")
      .option("url", s"file://$dir/page{page}.json")
      .option("pageSize", "10").option("maxPages", "5")
      .load()
    assert(df.rdd.getNumPartitions == 5) // partition per page range
    assert(df.count() == 25)
    assert(df.schema.fieldNames.toSet == Set("id", "name", "rating"))
    // nested struct landed as a native struct, values intact
    val got = df.select(col("id"), col("rating.count"))
      .as[(Long, Long)].collect().toMap
    assert(got == (0 until 25).map(i => i.toLong -> i.toLong).toMap)
  }

  test("offset/limit templating renders per partition") {
    val dir = java.nio.file.Files.createTempDirectory("rest_off")
    (0 until 3).foreach { p =>
      java.nio.file.Files.writeString(
        dir.resolve(s"off${p * 7}_lim7.json"),
        s"""[{"off":${p * 7}}]""")
    }
    val got = spark.read.format("graft-rest")
      .option("url", s"file://$dir/off{offset}_lim{limit}.json")
      .option("pageSize", "7").option("maxPages", "3")
      .load().select("off").as[Long].collect().toSet
    assert(got == Set(0L, 7L, 14L))
  }

  test("column pruning reaches the parse schema") {
    val dir = stagePages()
    val df = spark.read.format("graft-rest")
      .option("url", s"file://$dir/page{page}.json")
      .option("pageSize", "10").option("maxPages", "3")
      .load().select("name")
    // the scan's read schema is the pruned one, not the full struct —
    // the parser then never materializes id/rating at all
    val scan = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2
        .DataSourceV2ScanRelation => r.scan
    }.head
    assert(scan.readSchema().fieldNames.toSeq == Seq("name"))
    assert(df.as[String].collect().sorted.head == "item0")
  }

  test("per-partition retry recovers a transiently failing page") {
    FlakyFileFetcher.seen.clear()
    FlakyFileFetcher.attempts.set(0)
    val dir = stagePages()
    val df = spark.read.format("graft-rest")
      .option("url", s"file://$dir/page{page}.json")
      .option("pageSize", "10").option("maxPages", "3")
      .option("fetcher", classOf[FlakyFileFetcher].getName)
      .option("retryDelayMs", "1")
      .load()
    assert(df.count() == 25)
    // every page failed once and was re-fetched on its own task
    assert(FlakyFileFetcher.attempts.get() >= 6)
  }

  test("responseKey unwraps DummyJSON-shaped envelopes; absent key fails loudly") {
    // the reference's actual API shape (dummyjson_ingestor.py through
    // fetch_paginated's response_key): each page is
    // {"products": [...], "total": n, "skip": k} — the record list
    // must come from the named field, never the envelope itself
    val dir = java.nio.file.Files.createTempDirectory("rest_env")
    def page(p: Int, ids: Range): String =
      s"""{"products":${ids.map(i => s"""{"id":$i,"title":"p$i"}""")
        .mkString("[", ",", "]")},"total":25,"skip":${p * 10}}"""
    java.nio.file.Files.writeString(dir.resolve("page0.json"), page(0, 0 until 10))
    java.nio.file.Files.writeString(dir.resolve("page1.json"), page(1, 10 until 20))
    java.nio.file.Files.writeString(dir.resolve("page2.json"), page(2, 20 until 25))
    // past-the-end in envelope form: the list is empty, the envelope isn't
    java.nio.file.Files.writeString(dir.resolve("page3.json"),
      """{"products":[],"total":25,"skip":30}""")
    val df = spark.read.format("graft-rest")
      .option("url", s"file://$dir/page{page}.json")
      .option("pageSize", "10").option("maxPages", "4")
      .option("responseKey", "products")
      .load()
    // inference ran over the UNWRAPPED page: record fields only
    assert(df.schema.fieldNames.toSet == Set("id", "title"))
    assert(df.count() == 25)
    assert(df.select("id").as[Long].collect().toSet ==
      (0 until 25).map(_.toLong).toSet)
    // absent field = validation error, not empty data (the reference's
    // DataValidationError contract)
    val bad = intercept[Exception] {
      spark.read.format("graft-rest")
        .option("url", s"file://$dir/page{page}.json")
        .option("pageSize", "10").option("maxPages", "3")
        .option("retries", "0").option("retryDelayMs", "1")
        .option("responseKey", "items")
        .load().count()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).toSeq
    assert(chain(bad).exists(_.contains("no field 'items'")))
  }

  test("explicit user schema skips inference; missing pages obey the option") {
    val dir = stagePages()
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", "long").add("name", "string")
    // maxPages overshoots the staged files: page5.json doesn't exist
    val strict = spark.read.format("graft-rest").schema(schema)
      .option("url", s"file://$dir/page{page}.json")
      .option("pageSize", "10").option("maxPages", "6")
      .option("retryDelayMs", "1")
      .load()
    val e = intercept[org.apache.spark.SparkException] { strict.count() }
    assert(e.getMessage != null)
    val lenient = spark.read.format("graft-rest").schema(schema)
      .option("url", s"file://$dir/page{page}.json")
      .option("pageSize", "10").option("maxPages", "6")
      .option("missingPageIsEmpty", "true")
      .option("retries", "0")
      .load()
    assert(lenient.count() == 25)
    assert(lenient.schema == schema)
  }
}
