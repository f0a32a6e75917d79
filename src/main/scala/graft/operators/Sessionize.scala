package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: split each user's event stream into
  * sessions wherever the gap between consecutive events exceeds a
  * threshold. The classic clickstream operator the reference's daily
  * marts stop short of (its `user_activity` mart counts events per user;
  * sessions are the natural next aggregate — reference
  * database/layers/gold/publish_gold.py:63-87 is the closest analogue).
  *
  * Scale shape: ONE shuffle on the user column. Both windows (the lag
  * and the running sum) share the same `partitionBy(user)` sort, and the
  * session-level aggregate's clustering keys `(user, session_seq)` are a
  * superset of that partitioning, so `EnsureRequirements` adds no second
  * exchange — lag, cumsum, and groupBy all run in the same stage. Skewed
  * power users are bounded by per-user event counts, not corpus size.
  */
object Sessionize {

  private val NewFlag = "__graft_new_session"

  /** Tag every event with a per-user `session_seq` (1-based, in time
    * order). `tiebreak` makes the ordering total so re-runs and the
    * DuckDB oracle agree on equal timestamps.
    */
  def withSessionSeq(df: DataFrame, userCol: String, tsCol: String,
                     gapSeconds: Long, tiebreak: Seq[Column]): DataFrame = {
    val order = col(tsCol).asc +: tiebreak
    val w = Window.partitionBy(userCol).orderBy(order: _*)
    val prev = lag(col(tsCol), 1).over(w)
    // compare at microsecond precision (both Spark and the DuckDB oracle
    // store timestamps as micros) — unix_timestamp would truncate to
    // whole seconds and misclassify sub-second gaps at the boundary
    val isNew = when(prev.isNull
      .or(unix_micros(col(tsCol)) - unix_micros(prev) > gapSeconds * 1000000L), 1L)
      .otherwise(0L)
    df.withColumn(NewFlag, isNew)
      .withColumn("session_seq",
        sum(col(NewFlag)).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop(NewFlag)
  }

  /** Next-event training pairs — the sequence-example builder that
    * turns raw event logs into supervised data for a behavior model
    * (next-action prediction, churn, recommendation): within each
    * session, every event AFTER the first becomes one `(context,
    * target)` pair where `context` is the space-joined event types
    * preceding it (in time order) and `target` its own type. The
    * assembly discipline matters more than the model: pairs never
    * cross a session boundary (the 30-min gap is a semantic reset),
    * and `tiebreak` makes each pair's context replayable — the same
    * log always yields the same examples, on any engine.
    *
    * Scale shape: inherits [[withSessionSeq]]'s single user-keyed
    * shuffle — the pair window partitions by `(user, session_seq)`, a
    * superset of the session window's partitioning, so context
    * assembly rides the same exchange; context length is bounded by
    * session length (gap-bounded), never corpus size. Output:
    * `(userCol, session_seq, pair_pos, context, target)`.
    */
  def sessionPairs(df: DataFrame, userCol: String, tsCol: String,
                   typeCol: String, gapSeconds: Long,
                   tiebreak: Seq[Column]): DataFrame = {
    val order = col(tsCol).asc +: tiebreak
    val w = Window.partitionBy(col(userCol), col("session_seq"))
      .orderBy(order: _*)
    withSessionSeq(df, userCol, tsCol, gapSeconds, tiebreak)
      .withColumn("__ctx", collect_list(col(typeCol))
        .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("pair_pos", row_number().over(w) - 1)
      .filter(col("pair_pos") >= 1)
      .select(col(userCol), col("session_seq"), col("pair_pos"),
        concat_ws(" ", col("__ctx")).as("context"),
        col(typeCol).as("target"))
  }

  /** Session-level rollup: bounds, event count, decimal-summed value. */
  def sessionStats(df: DataFrame, userCol: String, tsCol: String,
                   valueCol: String, gapSeconds: Long,
                   tiebreak: Seq[Column]): DataFrame =
    withSessionSeq(df, userCol, tsCol, gapSeconds, tiebreak)
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        graft.Exprs.dsum(col(valueCol)).as("total_value"))

  /** First-order Markov transition matrix over per-user event
    * sequences: `(src_type, dst_type, n, prob_ppm)` where `n` counts
    * consecutive (event, next-event) pairs within each user's
    * time-ordered stream and `prob_ppm` is the exact integer-ppm row
    * probability (`n · 1,000,000 div Σ_dst n`). The behavioral
    * statistic next to [[graft.gold.Funnel]]: the funnel checks ONE
    * prescribed path, the transition matrix is every observed hop —
    * propensity models and anomaly detectors read it directly.
    *
    * Scale shape: the lead window partitions BY USER (one shuffle on
    * the user key, bounded per-user sort — never a global window);
    * the pair counts are a map-side-combinable aggregate over the
    * (src, dst) type grid, and the row totals join back by broadcast
    * (the grid is |types|², never data-sized). `tiebreak` makes each
    * user's order total so re-runs and the SQL twin agree.
    */
  def transitionMatrix(df: DataFrame, userCol: String, tsCol: String,
                       typeCol: String, tiebreak: Seq[Column]): DataFrame = {
    val order = col(tsCol).asc +: tiebreak
    val w = Window.partitionBy(userCol).orderBy(order: _*)
    val pairs = df
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("src_type"), col("__next").as("dst_type"))
      .agg(count(lit(1)).as("n"))
    // row totals via a window over the |types|²-row GRID, partitioned
    // by src_type — a separate totals aggregate + join would put the
    // whole fact-table lead-window subtree under a broadcast build
    // side, where exchange reuse is unreliable, and scan the corpus
    // twice; the grid window reads the pairs once and is bounded by
    // the type vocabulary, never the data
    pairs
      .withColumn("__tot",
        sum(col("n")).over(Window.partitionBy(col("src_type"))))
      .select(col("src_type"), col("dst_type"), col("n"),
        expr("n * 1000000L div __tot").as("prob_ppm"))
  }

  /** Long-run state mix of the event-type process: `iters` power-
    * iteration steps of π ← πP over the [[transitionMatrix]] chain —
    * "where does a user session END UP spending its time" as one
    * number per type, the summary the per-hop matrix cannot give.
    *
    * Scale shape: the ONLY fact-scale work is [[transitionMatrix]]'s
    * user-key window + grid aggregate; every iteration is a join and
    * aggregate over the |types|²-row grid — domain-sized, unrolled
    * `iters` times, each step checkpointed so the plan stays flat.
    * A type observed only as a DESTINATION (no outgoing hops) gets an
    * explicit self-loop row (the standard absorbing-state closure;
    * without it that type's mass would silently vanish each step).
    *
    * Determinism: P rides the matrix's exact ppm grid; π starts
    * uniform at round(1/k, 9); each step's terms are
    * round(π·ppm/1e6, 9) folded through the exact-decimal
    * [[graft.Exprs.dsum]], whose total is NEVER re-rounded (the q272
    * ulp lesson) — every intermediate sits on a fixed decimal grid,
    * so the unrolled SQL twin replays bit-for-bit. Output: one row
    * per type `(event_type, prob)`.
    */
  def stationaryDistribution(df: DataFrame, userCol: String, tsCol: String,
                             typeCol: String, tiebreak: Seq[Column],
                             iters: Int = 8): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val p = transitionMatrix(df, userCol, tsCol, typeCol, tiebreak)
      .select(col("src_type"), col("dst_type"), col("prob_ppm"))
    val types = p.select(col("src_type").as("t"))
      .unionByName(p.select(col("dst_type").as("t")))
      .distinct().localCheckpoint(true)
    val srcless = types
      .join(p.select(col("src_type").as("t")).distinct(), Seq("t"),
        "left_anti")
      .select(col("t").as("src_type"), col("t").as("dst_type"),
        lit(1000000L).as("prob_ppm"))
    val pFull = p.unionByName(srcless).localCheckpoint(true)
    val k = types.count() // bounded: the type vocabulary
    var pi = types.select(col("t"),
      round(lit(1.0) / k, 9).as("prob"))
    for (_ <- 1 to iters)
      pi = pFull.join(pi, col("src_type") === col("t"))
        .groupBy(col("dst_type"))
        .agg(graft.Exprs.dsum(
          round(col("prob") * col("prob_ppm") / 1e6, 9)).as("prob"))
        .select(col("dst_type").as("t"), col("prob"))
        .localCheckpoint(true)
    // a state that receives no mass drops out of the aggregate — emit
    // it with an explicit 0 so the output always carries every state
    types.join(pi, Seq("t"), "left")
      .select(col("t").as("event_type"),
        coalesce(col("prob"), lit(0.0)).as("prob"))
  }
}
