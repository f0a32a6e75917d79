package graft.audit

import org.apache.spark.sql.DataFrame

/** Guard rails over physical plans. A query that silently plans a
  * cartesian product is survivable at test scale and fatal at 100 TB;
  * asserting the plan shape at build/test time (or on a pipeline's
  * critical path before launch) is far cheaper than discovering it
  * three hours into a cluster run.
  */
object PlanGuard {

  /** Throw if the optimized physical plan contains a true cartesian
    * product. `BroadcastNestedLoopJoin` is deliberately NOT flagged:
    * it's the legitimate plan for one-row cross joins (scalar totals
    * joined into a table), which several operators here use.
    */
  def assertNoCartesian(df: DataFrame): DataFrame = {
    val plan = df.queryExecution.executedPlan.toString
    require(!plan.contains("CartesianProduct"),
      s"plan contains a CartesianProduct:\n${plan.take(2000)}")
    df
  }

  /** Throw if the plan has more shuffle exchanges than `max` — the
    * regression tripwire for operators that promise a fixed shuffle
    * budget (sessionize: 1, pack plan: 1, ...).
    */
  def assertMaxExchanges(df: DataFrame, max: Int): DataFrame = {
    val plan = df.queryExecution.executedPlan.toString
    val n = plan.sliding("Exchange".length).count(_ == "Exchange") -
      plan.sliding("BroadcastExchange".length).count(_ == "BroadcastExchange")
    require(n <= max,
      s"plan has $n shuffle exchanges (max $max):\n${plan.take(2000)}")
    df
  }
}
