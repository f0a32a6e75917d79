package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot aggregation keys: two-phase salted
  * aggregation. A single skewed key (one user producing 1% of 100 TB)
  * funnels its whole partition through one reducer; salting fans the
  * key across `saltBuckets` reducers for the partial phase, then a
  * second, tiny aggregation over (key, partial) merges. Only
  * decomposable aggregates (sum/count/min/max) can ride this — avg is
  * derived as sum/count at the end.
  *
  * AQE's skew-join handling covers joins; this covers aggregations,
  * where AQE does not re-split hot groups.
  */
object Salt {

  private val SaltCol = "__graft_salt"

  /** Salted sum/count/min/max aggregation over possibly-skewed keys.
    * `aggs` maps output name -> (valueColumn, "sum"|"count"|"min"|"max").
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltBuckets: Int,
                aggs: Map[String, (Column, String)]): DataFrame = {
    val salted = df.withColumn(SaltCol,
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val partials = aggs.map { case (name, (c, kind)) =>
      (kind match {
        case "sum" => sum(c)
        case "count" => count(c)
        case "min" => min(c)
        case "max" => max(c)
      }).as(s"__p_$name")
    }.toSeq
    val merged = aggs.map { case (name, (_, kind)) =>
      (kind match {
        case "sum" | "count" => sum(col(s"__p_$name"))
        case "min" => min(col(s"__p_$name"))
        case "max" => max(col(s"__p_$name"))
      }).as(name)
    }.toSeq
    salted
      .groupBy((keys :+ SaltCol).map(col): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merged.head, merged.tail: _*)
  }
}
