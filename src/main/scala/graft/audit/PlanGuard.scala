package graft.audit

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}

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

  /** Distinct shuffle exchanges in a physical plan, counted
    * STRUCTURALLY: AQE wrappers (`AdaptiveSparkPlanExec`, query stages)
    * are unwrapped, subquery plans are included, and a
    * `ReusedExchangeExec` counts zero — it re-reads an exchange already
    * counted elsewhere. (The old substring count saw "ReusedExchange"
    * as a second "Exchange" and tripped the guard on plans that
    * correctly reuse one shuffle.)
    */
  def shuffleCount(plan: SparkPlan): Int = plan match {
    case a: AdaptiveSparkPlanExec => shuffleCount(a.executedPlan)
    case q: QueryStageExec        => shuffleCount(q.plan)
    case _: ReusedExchangeExec    => 0
    case s: ShuffleExchangeLike =>
      1 + s.children.map(shuffleCount).sum + s.subqueries.map(shuffleCount).sum
    case p =>
      p.children.map(shuffleCount).sum + p.subqueries.map(shuffleCount).sum
  }

  /** Throw if the plan has more shuffle exchanges than `max` — the
    * regression tripwire for operators that promise a fixed shuffle
    * budget (sessionize: 1, pack plan: 1, ...).
    */
  def assertMaxExchanges(df: DataFrame, max: Int): DataFrame = {
    val n = shuffleCount(df.queryExecution.executedPlan)
    require(n <= max,
      s"plan has $n shuffle exchanges (max $max):\n" +
        df.queryExecution.executedPlan.toString.take(2000))
    df
  }
}
