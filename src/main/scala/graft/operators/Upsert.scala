package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed merge/upsert semantics, re-expressed as anti-join + union.
  *
  * The reference upserts with a staging table and `DELETE WHERE pk IN
  * (SELECT pk FROM temp)` then append (reference:
  * database/layers/silver/transform_silver.py:82-122) and with
  * `INSERT ... ON CONFLICT (date) DO UPDATE`
  * (reference: database/layers/gold/publish_gold.py:25-41,52-64,75-84).
  * Both are the same relational operation: rows of `current` whose key
  * appears in `updates` are replaced by the `updates` row.
  *
  * Scale notes: `left_anti` shuffles both sides on the key once; when
  * `updates` is a small daily delta Catalyst broadcasts it and the big
  * `current` side never shuffles. Union is free (no exchange). The write
  * back is an atomic directory overwrite (or dynamic partition overwrite
  * when the table is date-partitioned — see maintenance.Retention).
  */
object Upsert {

  /** current ⟕anti updates ∪ updates — last-writer-wins merge on `keys`. */
  def merge(current: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    current.join(updates, keys, "left_anti")
      .unionByName(updates, allowMissingColumns = false)

  /** Merge where `updates` may carry a schema superset (dynamic schema
    * evolution, reference dummyjson_ingestor.py:358-405
    * `ALTER TABLE ADD COLUMN`): missing columns null-fill on either side.
    */
  def mergeEvolving(current: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    current.join(updates, keys, "left_anti")
      .unionByName(updates, allowMissingColumns = true)

  /** Idempotent daily-grain upsert (gold marts keyed on `date UNIQUE`,
    * reference db_setup.py:251-263): replace any existing rows for the
    * dates present in `daily`.
    */
  def upsertByDate(mart: DataFrame, daily: DataFrame, dateCol: String = "date"): DataFrame =
    merge(mart, daily, Seq(dateCol))

  /** First publish of a bookkept mart: both audit stamps are `now`
    * (reference db_setup.py:258-262 `created_at/updated_at TIMESTAMP
    * DEFAULT CURRENT_TIMESTAMP`).
    */
  def stampNew(daily: DataFrame, now: Column): DataFrame =
    daily.withColumn("created_at", now).withColumn("updated_at", now)

  /** Bookkept upsert (reference publish_gold.py:37-41 `ON CONFLICT ...
    * DO UPDATE SET ..., updated_at = CURRENT_TIMESTAMP`): rows whose key
    * already exists in `mart` keep their original `created_at` and get a
    * fresh `updated_at`; brand-new keys get both stamps = `now`;
    * untouched mart rows are carried through unchanged.
    *
    * Scale: the carried-stamp lookup joins `daily` against a two-column
    * projection of the mart (key, created_at) — day-grain marts are tiny
    * and AQE broadcasts the projection; the anti-join half is the same
    * single shuffle as [[merge]].
    */
  def upsertStamped(mart: DataFrame, daily: DataFrame, now: Column,
                    keys: Seq[String]): DataFrame = {
    val prev = mart.select(keys.map(col) :+ col("created_at").as("_prev_created_at"): _*)
    val stamped = daily
      .join(prev, keys, "left")
      .withColumn("created_at", coalesce(col("_prev_created_at"), now))
      .withColumn("updated_at", now)
      .drop("_prev_created_at")
    merge(mart, stamped, keys)
  }
}
