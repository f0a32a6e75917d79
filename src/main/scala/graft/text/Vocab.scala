package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level term statistics: the vocabulary table a tokenizer
  * training run starts from, and TF-IDF term scoring for keyword-style
  * doc labeling. These are the explode-then-aggregate shapes where
  * Spark's map-side partial aggregation does the heavy lifting: the
  * shuffle carries one row per (partition, distinct key), not one row
  * per token instance.
  */
object Vocab {

  /** Vocabulary with occurrence and document frequencies. One explode +
    * one aggregate; `n_docs` uses count(DISTINCT id) inside the same
    * aggregate, which Spark plans as a two-phase partial/final distinct
    * — no extra job, no driver round-trip.
    */
  def vocab(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col(idCol)).as("n_docs"))

  /** The highest-TF-IDF term of each document (deterministic: ties
    * break on token order). Four shuffles — (id,token) term counts,
    * token document frequencies, the join back, the per-doc top-1 — and
    * each is on an aggregate, never on raw token instances. The corpus
    * size joins in as a one-row cross join (a broadcast nested loop),
    * NOT a driver-side collect, so the plan stays fully lazy. The
    * doc-frequency side is unhinted: vocabularies can reach GiBs at
    * corpus scale, so AQE should pick broadcast vs shuffle from the
    * actual size.
    */
  def topTfidfTerm(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = df
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val total = df.agg(count(lit(1)).as("n_total"))
    val score = col("tf").cast("double") *
      log(col("n_total").cast("double") / col("df"))
    val w = Window.partitionBy(idCol)
      .orderBy(col("score").desc, col("token").asc)
    tf.join(dfreq, Seq("token"))
      .crossJoin(total)
      .withColumn("score", score)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("token"), col("tf"), col("score"))
  }
}
