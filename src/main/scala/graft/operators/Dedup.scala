package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed deduplication — the central silver-layer operator of the
  * reference (reference: database/layers/silver/transform_silver.py:28-30,
  * 40-41, 53-55, 66-67 `sort_values(ts).drop_duplicates(keep='last')`).
  *
  * Spark-first design: a single hash-shuffle on the key plus a
  * per-partition sort (window `row_number`), NOT a global sort — pandas'
  * sort-whole-frame-then-drop approach would be a full `orderBy` at scale.
  * At 100 TB this is one exchange on the dedup key; AQE handles skewed
  * keys. Determinism: pandas `keep='last'` tie-breaks by input row order,
  * which has no distributed equivalent, so callers pass explicit
  * tiebreaker columns (document: last-writer-wins needs a total order).
  */
object Dedup {

  private val Rn = "__graft_rn"

  /** Keep exactly one row per key: the first under `ordering`. */
  def keepFirstBy(df: DataFrame, keys: Seq[String], ordering: Seq[Column]): DataFrame =
    topKPerKey(df, keys, ordering, 1)

  /** Per-group top-k under `ordering` (quota sampling / per-source
    * caps / per-key leaderboards). Spark plans the row_number filter as
    * `WindowGroupLimit`: each map task keeps only its local top-k per
    * key BEFORE the exchange, so the shuffle carries ≤ k rows per
    * (key, input partition) no matter how skewed the groups are.
    */
  def topKPerKey(df: DataFrame, keys: Seq[String], ordering: Seq[Column],
                 k: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    df.withColumn(Rn, row_number().over(w)).filter(col(Rn) <= k).drop(Rn)
  }

  /** Keep the newest row per key (reference `keep='last'` after an
    * ascending timestamp sort ≡ keep-max-timestamp). `tiebreakers` make
    * equal timestamps deterministic.
    */
  def keepLatest(df: DataFrame, keys: Seq[String], ts: String,
                 tiebreakers: Seq[Column] = Nil): DataFrame =
    keepFirstBy(df, keys, col(ts).desc +: tiebreakers)

  /** Keep the oldest row per key (reference `keep='first'` email dedup,
    * randomuser_ingestor.py:575-577).
    */
  def keepEarliest(df: DataFrame, keys: Seq[String], ts: String,
                   tiebreakers: Seq[Column] = Nil): DataFrame =
    keepFirstBy(df, keys, col(ts).asc +: tiebreakers)

  /** Full-row distinct (reference trailing `.drop_duplicates()`,
    * transform_silver.py:34,47,60,80). Map-side partial aggregation makes
    * this cheap when duplicates are common.
    */
  def distinctRows(df: DataFrame): DataFrame = df.distinct()

  /** 128-bit content digest over `contentCols` (a struct of two salted
    * 64-bit xxhash64 values). Hashing a STRUCT (not a string
    * concatenation) keeps column boundaries — a value containing a
    * separator byte cannot collide adjacent columns. Spark's hash
    * functions SKIP null fields (the seed passes through unchanged), so
    * ("a", null) and (null, "a") would still collide; appending explicit
    * per-column null flags to the hashed struct restores null-position
    * sensitivity. Two independently-salted 64-bit halves take the
    * birthday-collision odds from ~n²/2⁶⁵ (material at billions of
    * docs — silently dropping distinct documents) to ~n²/2¹²⁹.
    */
  def contentHash(contentCols: Seq[String]): Column = {
    val fields = contentCols.map(col) ++ contentCols.map(c => isnull(col(c)))
    struct(
      xxhash64(struct(fields: _*)).as("h1"),
      xxhash64(struct((lit(0x9E3779B97F4A7C15L) +: fields): _*)).as("h2"))
  }

  /** Exact content dedup by digest of selected columns: returns the
    * keeper row per content group (min id) plus the group size.
    * Hash-groupBy — one shuffle keyed by the digest, so 100 TB of text
    * shuffles only (digest, id) pairs after partial aggregation when
    * projected first.
    */
  def exactDedupKeepers(df: DataFrame, idCol: String, contentCols: Seq[String]): DataFrame =
    df.select(col(idCol), contentHash(contentCols).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("group_size"))

  /** Exact dedup as a filter: keep only the keeper row per content group.
    * Joins the keeper set back on the id — broadcast-able when the
    * duplicate groups are few, else a shuffled semi join on the id.
    * Right shape when rows are WIDE (the text itself never shuffles —
    * only (digest, id) pairs move).
    */
  def exactDedup(df: DataFrame, idCol: String, contentCols: Seq[String]): DataFrame =
    df.join(
      exactDedupKeepers(df, idCol, contentCols).select(col("keeper_id").as(idCol)),
      Seq(idCol), "left_semi")

  /** Exact dedup as one window pass: min-id row per content digest.
    * Right shape when the surviving rows are NARROW (already projected):
    * Spark plans it as `WindowGroupLimit` — partial top-1 per digest
    * map-side, so the single exchange carries at most one row per
    * (digest, input partition) and nothing is computed twice, where the
    * semi-join formulation re-evaluates its keeper aggregate per union
    * branch.
    */
  def exactDedupWindowed(df: DataFrame, idCol: String,
                         contentCols: Seq[String]): DataFrame = {
    val h = "__graft_content_hash"
    keepFirstBy(df.withColumn(h, contentHash(contentCols)), Seq(h),
      Seq(col(idCol).asc)).drop(h)
  }

  /** FIELD-level survivorship — the MDM "golden record" merge that
    * row-level keep-latest cannot express: one output row per key
    * where EACH attribute independently takes its most recent
    * NON-NULL value (ordered by `(tsCol, tiebreaks)` descending). A
    * newer partial record updates the fields it carries and leaves
    * the rest to older versions, so sparse feeds enrich instead of
    * erase. `last_seen` carries the key's newest timestamp.
    *
    * Shape: ONE map-side-combinable aggregate on the key — each
    * attribute is a `max_by(attr, ordering-key-if-non-null)` whose
    * null ordering keys make null attributes invisible to the max;
    * no window, no self-join, one shuffle at any scale. Determinism:
    * `tiebreaks` must make the per-key order total (the keep-latest
    * rule of this module).
    */
  def goldenRecord(df: DataFrame, keyCol: String, attrCols: Seq[String],
                   tsCol: String, tiebreaks: Seq[String]): DataFrame = {
    val ord = struct((col(tsCol) +: tiebreaks.map(col)): _*)
    val aggs = attrCols.map(a =>
      max_by(col(a), when(col(a).isNotNull, ord)).as(a)) :+
      max(col(tsCol)).as("last_seen")
    df.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
  }
}
