package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Testdata access + cross-engine-deterministic aggregate helpers. */
object Tables {
  /** Read one testdata table (TESTDATA.md layout).
    *
    * Timestamp columns must come out as TIMESTAMP (LTZ) — downstream
    * code uses `unix_micros` and friends, and the DuckDB oracle reads
    * the same µs wall-clock values (sessions run UTC, so LTZ and naive
    * agree). Two parquet layouts exist across testdata generations:
    *   - TIMESTAMP(NANOS): no native Spark type — read as long (legacy
    *     nanosAsLong) and convert with integer division (the data has no
    *     sub-µs component);
    *   - timestamp[us] with isAdjustedToUTC=false: would infer as
    *     TIMESTAMP_NTZ — disable `inferTimestampNTZ` so the SCAN types
    *     it as TIMESTAMP directly (keeps predicate pushdown on the
    *     column; a post-hoc cast would not).
    */
  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (df.schema.fields.exists(f =>
        f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType))
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }
}

/** Helpers that keep floating-point aggregates deterministic across
  * engines and partition orderings. A plain `sum(double)` depends on
  * partial-aggregation order (IEEE addition is not associative), so a
  * distributed run can differ from a single-threaded oracle in the last
  * ulp — and from itself run-to-run. Casting each row to DECIMAL first
  * makes the sum exact and order-independent; the final cast back to
  * DOUBLE is a single well-defined conversion. This is also the right
  * call at 100 TB: money sums over 10^12 rows accumulate real error in
  * binary doubles.
  */
object Exprs {
  val Money: DecimalType = DecimalType(18, 6)

  /** Order-independent sum of a double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(Money)).cast("double")

  /** Order-independent mean: exact decimal sum, one double division. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))
}
