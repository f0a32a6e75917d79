package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-p ("nucleus") selection per group: the smallest prefix of rows —
  * under a caller-supplied ordering — whose weights cover a `p` share
  * of the group total. The data-curation shape behind "keep the
  * products making 80% of each day's revenue" or "keep the sources
  * covering 95% of each language's tokens".
  *
  * Scale shape: one shuffle on the group key shared by both window
  * passes (group total and running sum — same partition spec, one
  * exchange). Weights accumulate in DECIMAL(18,6) so the running sum is
  * exact and order-independent across engines; the p-threshold compare
  * happens in double on the exact decimal sums.
  */
object Nucleus {

  private val Money = org.apache.spark.sql.types.DecimalType(18, 6)

  /** Rows whose group-ordered cumulative weight BEFORE the row is under
    * `p` × group total — i.e. the prefix that first reaches coverage
    * `p`, including the row that crosses it. `ordering` must be a total
    * order (pass a tiebreaker) or the prefix is nondeterministic.
    */
  def topPPerGroup(df: DataFrame, groupCols: Seq[String], weight: Column,
                   ordering: Seq[Column], p: Double): DataFrame = {
    val part = Window.partitionBy(groupCols.map(col): _*)
    val run = part.orderBy(ordering: _*).rowsBetween(Window.unboundedPreceding, 0)
    val w = weight.cast(Money)
    df.withColumn("__graft_w", w)
      .withColumn("__graft_tot", sum(col("__graft_w")).over(part))
      .withColumn("__graft_cum", sum(col("__graft_w")).over(run))
      .filter((col("__graft_cum") - col("__graft_w")).cast("double") <
        lit(p) * col("__graft_tot").cast("double"))
      .drop("__graft_w", "__graft_tot", "__graft_cum")
  }
}
