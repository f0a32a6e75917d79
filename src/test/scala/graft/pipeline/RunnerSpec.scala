package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import graft.TestSpark
import graft.audit.Audit

class RunnerSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def layout() = {
    val root = java.nio.file.Files.createTempDirectory("pipeline").toString
    Runner.Layout(s"$root/bronze", s"$root/silver", s"$root/gold", s"$root/audit")
  }

  private def staged(suffix: String) = Map(
    "products" -> Seq((1, s"Widget $suffix", 9.99, "tools"), (2, s"Gadget $suffix", 0.0, "toys"))
      .toDF("id", "title", "price", "category"),
    "carts" -> Seq((10, 100, 200.0, 150.0), (11, 101, 80.0, 80.0))
      .toDF("id", "userId", "total", "discountedTotal"),
    "users" -> Seq((100, "a@x.com", "Ada", "L"), (101, "b@y.org", "Bob", "M"))
      .toDF("id", "email", "firstname", "lastname"),
    "orders" -> Seq((1000, 100, 200.0, Some(180.0)))
      .toDF("id", "userId", "total_amount", "final_amount"))

  test("runFull: bronze -> silver -> quality -> gold -> audit, idempotent upserts") {
    val lay = layout()
    val r1 = Runner.runFull(spark, staged("v1"), lay, "test_api", "run1",
      ts("2024-01-01 12:00:00"))
    assert(r1.bronzeCounts == Map("products" -> 2, "carts" -> 2, "users" -> 2, "orders" -> 1))
    assert(r1.silverCounts("products") == 2)
    assert(r1.qualityResults.forall(_.passed))
    assert(r1.goldCounts("finance_mart") == 1) // one day
    assert(r1.goldCounts("sales_mart") == 1)
    assert(r1.goldCounts("operations_mart") == 1)

    // second run: same keys, later ingestion -> silver replaced not duplicated
    val r2 = Runner.runFull(spark, staged("v2"), lay, "test_api", "run2",
      ts("2024-01-02 12:00:00"))
    assert(r2.silverCounts("products") == 2) // upsert, no growth
    val titles = spark.read.parquet(s"${lay.silver}/products")
      .select("title").as[String].collect().toSet
    assert(titles == Set("Widget v2", "Gadget v2")) // latest won
    assert(r2.goldCounts("finance_mart") == 2) // both days present
    assert(r2.goldCounts("sales_mart") == 2)
    val ops = spark.read.parquet(s"${lay.gold}/operations_mart")
      .orderBy("event_date").collect()
    assert(ops.length == 2)
    assert(ops.forall(_.getAs[Double]("avg_discount_percentage") >= 0.0))

    val audit = Audit.read(spark, lay.audit).collect()
    assert(audit.length == 2 && audit.forall(_.status == "success"))
  }

  test("quality gate failure aborts before gold and audits the failure") {
    val lay = layout()
    // a null email survives the silver transform (duplicates would
    // collapse under the email-keyed dedup) and trips the PK null check
    val withNull = staged("v1") + ("users" -> Seq(
      (Some(100), None: Option[String], "Ada", "L"))
      .toDF("id", "email", "firstname", "lastname"))
    val ex = intercept[IllegalStateException] {
      Runner.runFull(spark, withNull, lay, "test_api", "runX",
        ts("2024-01-01 12:00:00"))
    }
    assert(ex.getMessage.contains("quality gate failed"))
    assert(!new java.io.File(s"${lay.gold}/finance_mart").exists())
    val audit = Audit.read(spark, lay.audit).collect()
    assert(audit.length == 1 && audit.head.status == "failed")
  }
}
