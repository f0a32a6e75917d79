package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation. `df.sample` draws
  * from a partition-seeded RNG, so its output changes whenever the file
  * layout or partitioning does — useless for reproducible corpus builds
  * or cross-engine verification. These samplers decide per ROW from the
  * row's own id via multiplicative integer hashing, so the sample is a
  * pure narrow filter: same rows kept on any cluster size, any file
  * split, any engine that can do 64-bit arithmetic (the DuckDB oracle
  * runs the identical expression).
  */
object Sample {

  /** Knuth's multiplicative constant (2^32 / phi). The id is reduced mod
    * a large prime FIRST so the product stays far below 2^63 — Spark 4
    * runs ANSI mode, where a silent overflow would instead be a runtime
    * error at scale.
    */
  private val Mult = 2654435761L
  private val Prime = 100000007L
  // Second multiplicative round for hashSplit (xxhash PRIME32_2 and a
  // different large prime): one multiplicative hash is LINEAR mod 1000,
  // so any seeded/re-multiplied single-round variant is just a constant
  // rotation or permutation of hashSample's bucket — a hash-sampled
  // subset would land in one split instead of stratifying. The
  // intermediate mod by a different prime breaks the linearity.
  // Max intermediate: 1e8 * 2246822519 < 2.3e17, ANSI-safe.
  private val Mult2 = 2246822519L
  private val Prime2 = 99999989L

  /** Stable per-row hash of the id reduced mod `m` — the shared
    * engine-portable primitive behind sampling and shard assignment.
    */
  def hashMod(id: Column, m: Long): Column = pmod((id % Prime) * Mult, lit(m))

  /** Per-row permille bucket in [0, 1000): stable hash of the id. */
  def bucket1000(id: Column): Column = hashMod(id, 1000L)

  /** Keep ~`permille`/1000 of rows, uniformly and deterministically. */
  def hashSample(df: DataFrame, idCol: String, permille: Int): DataFrame =
    df.filter(bucket1000(col(idCol)) < permille)

  /** Deterministic, disjoint, exhaustive corpus split (train/val/test):
    * every row gets exactly one label from its id-hash permille bucket,
    * cut at the cumulative bounds of `splits` (label → permille, must
    * sum to 1000). A pure narrow projection — same assignment on any
    * cluster size, file split, or engine, and stable across reruns, so
    * eval rows can never leak into training when the corpus is rebuilt.
    *
    * The bucket hash is a TWO-round multiplicative hash, deliberately
    * decorrelated from [[hashSample]]'s single-round bucket: one
    * multiplicative round is linear mod 1000, so a merely seeded or
    * re-multiplied single round would map a hash-sampled subset into a
    * constant rotation/permutation of its bucket range — the sample
    * would fall into one split instead of stratifying across all three
    * (the unit test proves the failure mode). `seed` gives further
    * independent split dimensions.
    */
  def hashSplit(df: DataFrame, idCol: String, splits: Seq[(String, Int)],
                splitCol: String = "split", seed: Long = 7919L): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "every split needs a positive permille share")
    require(splits.map(_._2).sum == 1000,
      s"split permilles must sum to 1000, got ${splits.map(_._2).sum}")
    val b = pmod((((col(idCol) + seed) % Prime) * Mult % Prime2) * Mult2,
      lit(1000L))
    val bounds = splits.scanLeft(0)(_ + _._2).tail
    val label = splits.zip(bounds).dropRight(1)
      .foldRight(lit(splits.last._1): Column) {
        case (((name, _), bound), rest) => when(b < bound, lit(name)).otherwise(rest)
      }
    df.withColumn(splitCol, label)
  }

  /** Stratified variant: an independent rate per stratum value (e.g.
    * downsample boilerplate-heavy sources harder than curated ones).
    * Strata absent from the map are dropped (quota 0).
    */
  def stratifiedHashSample(df: DataFrame, idCol: String, stratumCol: String,
                           permille: Map[String, Int]): DataFrame = {
    val quota = permille.foldLeft(lit(0)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(bucket1000(col(idCol)) < quota)
  }

  /** Deterministic weighted sample without replacement, k rows per
    * stratum (Efraimidis–Spirakis A-ES): each row draws an exponential
    * key `-ln(u)/w` from its own id-hash uniform `u`, and the k
    * smallest keys per stratum win — rows with twice the weight are
    * twice as likely to make the cut. A pure projection plus one
    * `WindowGroupLimit` top-k (map-side partial top-k, then one
    * exchange on the stratum). The key is rounded to 9 decimals before
    * ranking: `ln` is the one non-IEEE-exact step (libm vs JVM differ
    * in the last ulp), and 9 dp with an id tiebreaker makes the ranking
    * engine-portable. Rows with weight <= 0 are dropped.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     stratumCol: String, k: Int): DataFrame = {
    val u = (hashMod(col(idCol), 1000000L).cast("double") + 0.5) / 1000000.0
    val key = round(-log(u) / col(weightCol), 9)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol)).orderBy(key.asc, col(idCol).asc)
    df.filter(col(weightCol) > 0)
      .withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") <= k)
      .drop("__graft_rn")
  }

  /** Domain mixing: downsample strata so the output matches the target
    * weight distribution at the maximum achievable volume. The largest
    * total T satisfying `weight(s)·T <= count(s)` for every stratum is
    * `T = min_s count(s)/weight(s)`; each stratum then keeps
    * `floor(1000·w·T/count)` permille of its rows via the deterministic
    * id hash. Fully declarative: stratum counts are an aggregate, the
    * global minimum is a one-row cross join, and the rates join back on
    * the stratum key (strata counts are small — AQE broadcasts them) —
    * no driver-side collect, so it composes lazily into larger plans.
    * Strata without a target weight are dropped.
    */
  def mixtureSample(df: DataFrame, idCol: String, stratumCol: String,
                    weights: Map[String, Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val w = weights.toSeq.toDF(stratumCol, "__w")
    val counts = df.groupBy(stratumCol)
      .agg(count(lit(1)).cast("double").as("__cnt"))
      .join(w, stratumCol)
    val tmax = counts.agg(min(col("__cnt") / col("__w")).as("__tmax"))
    val rates = counts.crossJoin(tmax)
      .select(col(stratumCol),
        floor(lit(1000) * col("__w") * col("__tmax") / col("__cnt"))
          .as("__permille"))
    df.join(rates, stratumCol)
      .filter(bucket1000(col(idCol)) < col("__permille"))
      .drop("__permille")
  }
}
