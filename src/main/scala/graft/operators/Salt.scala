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

  /** Salted shuffle join for a skewed LEFT side: when one hot join key
    * holds a disproportionate share of the fact rows, a plain shuffle
    * join sends that entire key to one reducer and the stage runs at the
    * speed of its slowest task. Salting appends a per-row salt to the
    * fact side's key (so the hot key spreads over `saltBuckets`
    * reducers) and replicates each row of the other side once per salt
    * value, making the join key `(keys..., salt)` — the classic
    * replicate-the-small-side skew join. Output is EXACTLY the plain
    * join: every left row carries one salt value and every right row
    * exists in all buckets, so the matched pairs are identical; the salt
    * column is dropped before returning.
    *
    * The salt is content-deterministic (hash of the left row), so
    * results are reproducible across partitionings and retries —
    * no `rand()`.
    *
    * Cost model: the right side is written `saltBuckets`× into the
    * exchange, so size `saltBuckets` to the skew (hot-key share ×
    * parallelism), not to the cluster. Only `inner` and `left` joins are
    * supported: a right/full join would emit one row per REPLICA of an
    * unmatched right row. AQE's skew-join split covers sort-merge joins
    * after the fact; this operator is the plan-level guarantee, and the
    * one that still works when the skewed side is the probe of a
    * broadcast-impossible join.
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
                 saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    require(saltBuckets >= 1, s"saltBuckets must be >= 1, got $saltBuckets")
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter")(jt),
      s"saltedJoin supports inner/left joins only, got $joinType")
    val salted = skewed.withColumn(SaltCol,
      pmod(xxhash64(skewed.columns.map(col): _*), lit(saltBuckets)).cast("int"))
    val replicated = other.withColumn(SaltCol,
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, keys :+ SaltCol, joinType).drop(SaltCol)
  }
}
