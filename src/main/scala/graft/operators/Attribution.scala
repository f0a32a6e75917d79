package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch marketing attribution: distribute each conversion's
  * value over the user's preceding touch events under four standard
  * credit models at once — linear (1/k each), first-touch, last-touch,
  * and time-decay (half-life weighting) — aggregated per touch channel.
  *
  * Scale shape: the touch→conversion pairing is a per-user equi-join
  * with a bounded lookback predicate, so candidate volume is
  * O(touches_per_user · conversions_per_user) within each user — never
  * a cross product across users — and the per-conversion credit math is
  * ONE window pass over the pair table partitioned by conversion id.
  * Users are independent, so the plan is embarrassingly parallel and
  * AQE's skew handling covers a pathological mega-user.
  *
  * Determinism: linear shares are one IEEE division (exact on any
  * engine); the time-decay weight is the only transcendental and is
  * rounded to 9 dp before the per-conversion DECIMAL window sum that
  * normalizes it (the q105/q114 discipline); channel totals accumulate
  * through `Exprs.dsum`. First/last ties break on event id.
  *
  * Conversions with NO touch inside the lookback are inner-joined away;
  * report them separately if unattributed volume matters.
  */
object Attribution {

  /** Per-channel attributed value under four credit models.
    *
    * @param df             event stream
    * @param convType       event_type value marking a conversion
    * @param lookbackDays   touch window before each conversion
    * @param halfLifeDays   time-decay half-life
    */
  def multiTouch(df: DataFrame, userCol: String = "user_id",
                 tsCol: String = "ts", typeCol: String = "event_type",
                 valueCol: String = "value", idCol: String = "event_id",
                 convType: String = "purchase", lookbackDays: Int = 7,
                 halfLifeDays: Double = 7.0): DataFrame = {
    val dayUs = 86400000000L
    val touches = df.filter(col(typeCol) =!= convType)
      .select(col(userCol).as("__u"), col(typeCol).as("channel"),
        unix_micros(col(tsCol)).as("__tus"), col(idCol).as("__tid"))
    val convs = df.filter(col(typeCol) === convType)
      .select(col(userCol).as("__u"), unix_micros(col(tsCol)).as("__cus"),
        col(valueCol).as("__v"), col(idCol).as("__cid"))

    val paired = touches.join(convs, Seq("__u"))
      .filter(col("__tus") < col("__cus") &&
        col("__tus") >= col("__cus") - lit(lookbackDays.toLong * dayUs))

    val byConv = Window.partitionBy("__cid")
    val ordAsc = byConv.orderBy(col("__tus").asc, col("__tid").asc)
    val ordDesc = byConv.orderBy(col("__tus").desc, col("__tid").desc)
    // 6 dp, not 9: the weight is summed through a DECIMAL(18,6)
    // accumulator, and a 9 dp value can land EXACTLY on the cast's
    // half-way grid, where engines' double→decimal rounding diverges
    // (the Hits lesson — 3/3500 values diverged at sf0.01 before it
    // moved to the accumulator's own grid).
    val decay = round(pow(lit(0.5),
      (col("__cus") - col("__tus")).cast("double") /
        (lit(halfLifeDays) * dayUs)), 6)

    val credited = paired
      .withColumn("__k", count(lit(1)).over(byConv))
      .withColumn("__rn_a", row_number().over(ordAsc))
      .withColumn("__rn_d", row_number().over(ordDesc))
      .withColumn("__w", decay)
      .withColumn("__sw",
        sum(col("__w").cast(graft.Exprs.Money)).over(byConv).cast("double"))

    credited.groupBy("channel").agg(
      countDistinct(col("__cid")).as("conversions_touched"),
      count(lit(1)).as("touches"),
      graft.Exprs.dsum(col("__v") / col("__k")).as("linear_value"),
      graft.Exprs.dsum(when(col("__rn_a") === 1, col("__v"))
        .otherwise(lit(0.0))).as("first_touch_value"),
      graft.Exprs.dsum(when(col("__rn_d") === 1, col("__v"))
        .otherwise(lit(0.0))).as("last_touch_value"),
      graft.Exprs.dsum(col("__v") * col("__w") / col("__sw"))
        .as("decay_value"))
  }
}
