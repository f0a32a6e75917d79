package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range join: match points to the intervals containing them
  * (`start <= point < end`) without a cross product. Naive inequality
  * joins plan as BroadcastNestedLoop/Cartesian — O(points × intervals).
  * Here both sides map onto fixed-width time buckets: each interval
  * explodes to the buckets it covers, each point lands in exactly ONE
  * bucket, and the match becomes an equi-join on the bucket id plus a
  * residual bounds filter. Each (interval, point) pair meets in exactly
  * one bucket (the point's), so no dedup pass is needed. Bucket width
  * tunes the explosion factor: ~interval length is the sweet spot.
  */
object RangeJoin {

  /** Join `points` (with timestamp `pointTs`) to `intervals` (with
    * `[startTs, endTs)` timestamps). Output: every interval column plus
    * every point column for each containment match.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointTs: String, startTs: String, endTs: String,
                      bucketSeconds: Long = 86400L): DataFrame = {
    val pBucket = (unix_timestamp(col(pointTs)) / bucketSeconds).cast("long")
    val iBuckets = sequence(
      (unix_timestamp(col(startTs)) / bucketSeconds).cast("long"),
      // end is exclusive: the last covered bucket is that of end - 1s
      ((unix_timestamp(col(endTs)) - 1) / bucketSeconds).cast("long"))
    val p = points.withColumn("__bucket", pBucket)
    val i = intervals.withColumn("__bucket", explode(iBuckets))
    i.join(p, Seq("__bucket"))
      .filter(col(pointTs) >= col(startTs) && col(pointTs) < col(endTs))
      .drop("__bucket")
  }
}
