package graft.gold

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import graft.TestSpark

class GoldSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events = Seq(
    (1L, 100L, 10.0, ts("2024-01-01 10:00:00")),
    (2L, 100L, 20.0, ts("2024-01-01 11:00:00")),
    (3L, 200L, 30.0, ts("2024-01-02 09:00:00"))
  ).toDF("event_id", "user_id", "value", "ts")

  test("dailyRevenue: count/sum/avg/distinct per day") {
    val out = Gold.dailyRevenue(events, "ts", "user_id", "value")
      .orderBy("event_date").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("events_count") == 2)
    assert(out(0).getAs[Double]("total_value") == 30.0)
    assert(out(0).getAs[Double]("avg_value") == 15.0)
    assert(out(0).getAs[Long]("unique_users") == 1)
    assert(out(1).getAs[Long]("unique_users") == 1)
  }

  test("productCatalog: per-category stats") {
    val parts = Seq(("a", 1.0), ("a", 3.0), ("b", 10.0)).toDF("cat", "price")
    val out = Gold.productCatalog(parts, "cat", "price").orderBy("cat").collect()
    assert(out(0).getAs[Long]("product_count") == 2)
    assert(out(0).getAs[Double]("min_price") == 1.0)
    assert(out(0).getAs[Double]("max_price") == 3.0)
    assert(out(0).getAs[Double]("avg_price") == 2.0)
  }

  test("topProductsDaily ranks by qty desc, product id asc, concatenates top-k") {
    import org.apache.spark.sql.functions.col
    val detail = Seq(
      // day 1: p2 qty 8, p1 qty 5, p3 qty 5, p4 qty 1 -> top3 "2,1,3"
      ("2024-01-01", 1L, 5.0), ("2024-01-01", 2L, 8.0),
      ("2024-01-01", 3L, 3.0), ("2024-01-01", 3L, 2.0),
      ("2024-01-01", 4L, 1.0),
      // day 2: only one product
      ("2024-01-02", 7L, 2.0)
    ).toDF("d", "pid", "qty")
    val out = Gold.topProductsDaily(detail, col("d"), col("pid"), col("qty"), k = 3)
      .orderBy("event_date").as[(String, String)].collect()
    assert(out.toSeq == Seq(("2024-01-01", "2,1,3"), ("2024-01-02", "7")))
  }

  test("userActivity: left join keeps order-less users with zero totals") {
    val users = Seq((100L, "u1"), (300L, "u3")).toDF("user_id", "name")
    val facts = events.withColumnRenamed("event_id", "fact_id")
    val out = Gold.userActivity(users, facts, "user_id", "fact_id", "value", "ts")
      .orderBy("user_id").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("order_count") == 2)
    assert(out(0).getAs[Double]("total_spend") == 30.0)
    assert(out(1).getAs[Long]("order_count") == 0) // no facts
    assert(out(1).getAs[Double]("total_spend") == 0.0)
    assert(out(1).isNullAt(out(1).fieldIndex("last_order_ts")))
  }

  test("financeKpis single-row aggregates") {
    val out = Gold.financeKpis(events, "value").collect().head
    assert(out.getAs[Double]("total_revenue") == 60.0)
    assert(out.getAs[Double]("avg_order_value") == 20.0)
    assert(out.getAs[Long]("order_count") == 3)
  }
}
