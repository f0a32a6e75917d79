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

  /** Weekly cohort retention matrix — [[cohortRetention]]'s sibling at
    * week grain and raw-count shape: each user joins the cohort of
    * their FIRST-seen week, and cell (cohort_week, week_offset) counts
    * the cohort's distinct users active `offset` weeks later (offset 0
    * = the cohort's own size). Pick THIS face for weekly dashboards
    * that aggregate further downstream (it emits counts, no ppm and no
    * cohort_size column); pick [[cohortRetention]] for the day-grain
    * matrix with exact-ppm retention built in. Both share the same
    * scale shape; they differ only in grain and output contract.
    *
    * Scale shape: one user-keyed min-aggregate for first-seen (map-
    * side combinable), one equi-join back on the user key (user-
    * domain-sized build side — a SHUFFLE join by design: at 100 TB the
    * user dimension is not broadcastable), then one (cohort, offset)
    * aggregate with a distinct-user count (Spark's two-phase partial
    * distinct). Weeks truncate Monday-start (both engines'
    * `date_trunc('week')`), offsets count whole weeks between the two
    * truncated dates — exact integer arithmetic, no timezone exposure.
    */
  def cohortRetentionWeekly(df: DataFrame, userCol: String,
                            tsCol: String): DataFrame = {
    val weeks = df.select(col(userCol).as("__u"),
      date_trunc("week", col(tsCol)).cast("date").as("__w"))
    val cohorts = weeks.groupBy("__u").agg(min(col("__w")).as("__c"))
    weeks.join(cohorts, Seq("__u"))
      .groupBy(col("__c").as("cohort_week"),
        (datediff(col("__w"), col("__c")) / 7).cast("long")
          .as("week_offset"))
      .agg(countDistinct(col("__u")).as("n_users"))
  }

  /** Ordered funnel conversion, unbounded-horizon variant — the
    * step-sequence audit ("of users who VIEWED, how many went on to
    * CLICK, then PURCHASE?"): step i counts a user only if they
    * performed it AT OR AFTER their earliest qualifying time for step
    * i−1, so out-of-order events never inflate conversion. Contrast
    * with [[funnel]], which is STRICTLY-after with a `windowDays`
    * conversion horizon and ppm output — use [[funnel]] for
    * campaign-window conversion reporting, THIS face for whole-history
    * step counts (bound the horizon by pre-filtering `df` to the
    * period of interest).
    *
    * Scale shape: folding all steps into a SINGLE groupBy pass would
    * be wrong (step i's floor depends on step i−1's result), so each
    * step is one user-keyed aggregate over the rows of ITS OWN event
    * type joined to the previous step's user table — the per-step
    * input shrinks monotonically (classic funnel narrowing), every
    * join is a user-key equi-join. Output: one row per step
    * `(step, step_name, n_users)` with step 1-based.
    */
  def funnelOrdered(df: DataFrame, userCol: String, tsCol: String,
                    typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnelOrdered needs at least one step")
    val init = df.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol).as("__u"))
      .agg(min(col(tsCol)).as("__t"))
      .localCheckpoint(true)
    val reached = steps.tail.scanLeft(init) { (prev, step) =>
      df.filter(col(typeCol) === step)
        .select(col(userCol).as("__u"), col(tsCol).as("__ts"))
        .join(prev, Seq("__u"))
        .filter(col("__ts") >= col("__t"))
        .groupBy(col("__u"))
        .agg(min(col("__ts")).as("__t"))
        .localCheckpoint(true)
    }
    reached.zip(steps).zipWithIndex.map { case ((frame, name), i) =>
      frame.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1L).as("step"), lit(name).as("step_name"),
          col("n_users"))
    }.reduce(_ unionByName _)
  }
}
