package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-step conversion funnel over an event stream — the
  * view→click→purchase analytic every e-commerce store runs (reference
  * domain; beyond the reference's per-type counts, this enforces step
  * ORDER and a conversion window).
  *
  * Semantics (the standard "strict-order, first-touch" funnel): a user
  * reaches step k if there is an occurrence of step k STRICTLY after
  * their first qualifying occurrence of step k-1, and within
  * `windowDays` of their FIRST step-1 event. First occurrences make
  * the result deterministic (no per-event credit ambiguity) and a pure
  * function of (user, step, min qualifying ts).
  *
  * Shape for 100 TB: step k is one filter + one equi-join on the user
  * key + one min-aggregate — every stage hash-partitions by user, the
  * reached-set shrinks monotonically down the funnel, and nothing
  * windows globally or collects. With the events table bucketed by
  * user the joins are co-partitioned.
  */
object Funnel {

  /** Per-step `(step, step_idx, users, conversion_ppm)` — conversion
    * is exact integer ppm of the step-1 cohort (floor division; no
    * float quotient can drift between engines).
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String],
             windowDays: Int = 7): DataFrame = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps, got $steps")
    val win = lit(windowDays.toLong * 86400000000L)
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol).as("__u"))
      .agg(min(unix_micros(col(tsCol))).as("__t1"))
      .withColumn("__tprev", col("__t1"))
    val reached = steps.tail.scanLeft(first) { (prev, st) =>
      events.filter(col(typeCol) === st)
        .select(col(userCol).as("__u"), unix_micros(col(tsCol)).as("__ts"))
        .join(prev.select(col("__u"), col("__t1"), col("__tprev")),
          Seq("__u"))
        .filter(col("__ts") > col("__tprev") &&
          col("__ts") <= col("__t1") + win)
        .groupBy(col("__u"), col("__t1"))
        .agg(min(col("__ts")).as("__tprev"))
    }
    val tagged = reached.zipWithIndex.map { case (df, i) =>
      df.select(lit(steps(i)).as("step"),
        lit((i + 1).toLong).as("step_idx"), col("__u"))
    }
    val counts = tagged.reduce(_ unionByName _)
      .groupBy(col("step"), col("step_idx"))
      .agg(count(lit(1)).as("users"))
    val base = counts.filter(col("step_idx") === 1)
      .select(col("users").as("__base"))
    counts.crossJoin(broadcast(base))
      .select(col("step"), col("step_idx"), col("users"),
        expr("users * 1000000L div __base").as("conversion_ppm"))
  }

  /** Day-grain cohort retention matrix: users cohorted by their FIRST
    * active day; `(cohort_date, days_since, active_users,
    * retention_ppm)` for every (cohort, offset) with activity. The
    * lifecycle-health analytic next to [[Funnel.funnel]]'s acquisition
    * view.
    *
    * Shape: one (user, day) distinct, one per-user min, one join back
    * on the user key, one aggregate — all on the user/day keys, no
    * windows, no collects; retention is exact integer ppm of the
    * cohort size.
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String)
      : DataFrame = {
    val act = events
      .select(col(userCol).as("__u"), to_date(col(tsCol)).as("__d"))
      .distinct()
    val first = act.groupBy(col("__u")).agg(min(col("__d")).as("cohort_date"))
    val sizes = first.groupBy(col("cohort_date"))
      .agg(count(lit(1)).as("cohort_size"))
    act.join(first, Seq("__u"))
      .groupBy(col("cohort_date"),
        datediff(col("__d"), col("cohort_date")).cast("long")
          .as("days_since"))
      .agg(count(lit(1)).as("active_users"))
      .join(broadcast(sizes), Seq("cohort_date"))
      .select(col("cohort_date"), col("days_since"), col("active_users"),
        col("cohort_size"),
        expr("active_users * 1000000L div cohort_size")
          .as("retention_ppm"))
  }
}
