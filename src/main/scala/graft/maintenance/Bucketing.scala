package graft.maintenance

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers for co-located joins: write both sides
  * bucketed by the join key and Spark plans the join with ZERO
  * exchanges — the at-scale answer for fact tables joined repeatedly
  * on the same key (the shuffle is paid once at write time, amortized
  * over every subsequent join/aggregation on that key).
  */
object Bucketing {

  /** Persist `df` as a bucketed managed table (session catalog). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket key — shuffle-free when
    * both were written with the same bucket count on `key`.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String, joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key), joinType)
}
