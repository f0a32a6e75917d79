package graft.maintenance

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class BucketingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed join on the bucket key plans with no shuffle exchange") {
    val left = (1L to 1000L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (1L to 1000L).map(i => (i, i * 2.0)).toDF("k", "rv")
    Bucketing.writeBucketed(left, "bkt_left", "k", buckets = 4, sortCols = Seq("k"))
    Bucketing.writeBucketed(right, "bkt_right", "k", buckets = 4, sortCols = Seq("k"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val joined = Bucketing.bucketedJoin(spark, "bkt_left", "bkt_right", "k")
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free bucketed join:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }
}
