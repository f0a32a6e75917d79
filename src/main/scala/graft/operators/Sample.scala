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
  *
  * ID CONTRACT: ids must be NONNEGATIVE. The engine normalizes the
  * final bucket with `pmod` (always in `[0, m)`), but SQL engines'
  * `%` truncates toward zero, so a negative id gives the oracle a
  * negative bucket that trivially passes every `< threshold` cut —
  * engine and oracle verdicts silently diverge. Surrogate ids from a
  * negative or hashed space should be masked into the nonnegative
  * range (`abs` is NOT enough: abs(Long.MinValue) overflows — use
  * `& Long.MaxValue`) before sampling.
  */
object Sample {

  /** Knuth's multiplicative constant (2^32 / phi). The id is reduced mod
    * a large prime FIRST so the product stays far below 2^63 — Spark 4
    * runs ANSI mode, where a silent overflow would instead be a runtime
    * error at scale.
    */
  private[graft] val Mult = 2654435761L
  private[graft] val Prime = 100000007L
  // Second multiplicative round for the sampler family (xxhash
  // PRIME32_2 and a different large prime): one multiplicative hash is
  // LINEAR mod 1000, so any seeded/re-multiplied single-round variant
  // is just a constant rotation or permutation of the same bucket —
  // composed samplers would intersect buckets (min(p, r)) instead of
  // multiplying rates, and a hash-sampled subset would land in one
  // split instead of stratifying. The intermediate mod by a different
  // prime breaks the linearity. See [[hashMod2]].
  private[graft] val Mult2 = 2246822519L
  private[graft] val Prime2 = 99999989L

  /** Stable per-row hash of the id reduced mod `m` — the engine-portable
    * primitive behind SHARD assignment ([[graft.operators.Pack]]). One
    * multiplicative round is linear mod m, so this must never decide two
    * composed KEEP/DROP verdicts — samplers use [[hashMod2]] instead.
    */
  def hashMod(id: Column, m: Long): Column = pmod((id % Prime) * Mult, lit(m))

  /** Two-round MULTIPLIER-seeded hash of the id reduced mod `m` — the
    * sampler primitive. One multiplicative round is LINEAR mod m, so
    * two single-round samplers decide from the SAME bucket: keeping
    * permille p then rate r yields min(p, r) rows, not the p·r/1000
    * independent composition a pipeline expects. Nor does an INPUT
    * shift fix a fixed two-round chain: g(id+s₂) = g(id+s₁) + c mod m
    * up to the one mod-P2 wrap — a composition of affine maps — so
    * seeded variants of the same function stay one of two constant
    * rotations apart (measured: a 200‰∘500‰ chain kept 127‰, and a
    * split of a sample put 0 rows in val). The seed therefore perturbs
    * the FIRST-ROUND MULTIPLIER: buckets from different seeds differ by
    * a per-row shift `(id%P)·Δseed mod P2`, not a constant, so composed
    * samplers multiply rates (unit-proven ≈ p·r, and measured 50.1% /
    * 24.9% / 80-10-10 cross-seed splits on 50k ids). Same seed = same
    * verdict — nested subsampling stays a deliberate feature. Max
    * intermediate: 1e8 · (Mult + maxSeed) ≤ 6.4e18 < 2^63 — ANSI-safe.
    */
  def hashMod2(id: Column, m: Long, seed: Long): Column = {
    require(seed >= 0 && seed <= 60000000000L,
      s"seed must be in [0, 6e10] to stay ANSI-overflow-safe, got $seed")
    pmod(((id % Prime) * (Mult + seed) % Prime2) * Mult2, lit(m))
  }

  /** Per-row permille bucket in [0, 1000) from the seeded two-round
    * hash — the shared sampler bucket.
    */
  def bucket1000(id: Column, seed: Long): Column = hashMod2(id, 1000L, seed)

  /** Per-row parts-per-million bucket in [0, 1e6) — the verdict bucket
    * for the RATE-DERIVING samplers ([[mixtureSample]],
    * [[stratifiedHashSample]]). At permille granularity any stratum
    * whose correct rate lands below 1‰ — a huge stratum with a small
    * target weight, exactly the boilerplate-downweighting case — floors
    * to 0 and is silently dropped, shifting the output mixture; ppm
    * pushes that cliff three orders of magnitude out. Note
    * `bucketPpm(id) % 1000 == bucket1000(id)` (1000 divides 1e6), so
    * the two scales share the hash but a ppm threshold is NOT a
    * rescaled permille threshold — oracles embed the `% 1000000` form.
    */
  def bucketPpm(id: Column, seed: Long): Column = hashMod2(id, 1000000L, seed)

  /** Deterministic epoch shuffle: every row's TRAINING-ORDER position
    * for epoch `epoch` — `row_number` over the seeded portable hash of
    * the id ([[hashMod2]] with the epoch as seed, id as tiebreak for
    * the ≤ n/1e9 colliding buckets), appended as `out` (1-based). Each
    * epoch is an independent pseudo-random permutation that is a pure
    * function of (id, epoch): identical on any cluster size, file
    * split, or rerun; resumable mid-epoch (the position is DATA, not
    * iterator state); and decorrelated across epochs the same measured
    * way composed samplers are (multiplier-seeded, not input-shifted —
    * see [[hashMod2]]). The global row number rides
    * [[Ranks.rowNumber]]'s bucket scheme, never a single-task window —
    * the reason this beats `orderBy(rand(seed))`, which is BOTH
    * nondeterministic under retries (rand is partition-index-seeded)
    * and a global sort. Compose with [[Pack.concatSplit]] ordered by
    * the position to turn the permutation into packed sequences.
    */
  def epochOrder(df: DataFrame, idCol: String, epoch: Long,
                 out: String = "train_pos"): DataFrame =
    Ranks.rowNumber(
      df.withColumn("__ek", hashMod2(col(idCol), 1000000000L, epoch)),
      "__ek", ascending = true, tiebreaks = Seq(idCol), out = out)
      .drop("__ek")

  /** Shuffled-bucket curriculum order (Bengio et al. 2009's schedule,
    * the way pipelines actually ship it): rows are NTILE'd into
    * `buckets` difficulty tiers (easy first), the epoch visits tiers
    * in order, and WITHIN a tier rows are portable-hash shuffled — the
    * curriculum ramps difficulty while adjacent examples stay
    * decorrelated (a plain `ORDER BY difficulty` would feed the model
    * near-duplicate difficulty runs back-to-back). Deterministic and
    * engine-replayable like [[epochOrder]]: position is a pure
    * function of (difficulty rank, id, epoch).
    *
    * Scale shape: an NTILE pass for the tier, then a FUSED global row
    * number over the composite order `((tier − 1)·10⁹ + hash, id)` —
    * never a single-task window. The fuse (r14 verdict A/B): a
    * generic [[Ranks.rowNumber]] second pass would spend a
    * `approx_percentile` sketch read discovering the key distribution,
    * but the composite key's structure is already known exactly — the
    * tier is a ready-made range bucket and the hash is uniform in
    * [0, 10⁹) — so the bucket id is the pure projection
    * `(tier − 1)·subPerTier + (hash div step)`, per-bucket counts are
    * exact, and the within-bucket window orders by `(hash, id)`. Two
    * reads of the checkpointed tier frame instead of three, no eager
    * driver collect, and the resulting permutation is bit-identical
    * to ranking by the composite key (the bucket is monotone in
    * `(tier, hash)` and bucket-ties order by exactly the key's
    * remaining components). With ≤ 64 tiers the hash is sub-split so
    * ~64 window partitions always exist; above 64 tiers the tiers
    * themselves are the buckets (the offsets table is tier-count-sized
    * — bounded by the 10⁶ require, the documented B-rows-not-facts
    * exception). Long-range safety: with `buckets ≤ 10⁶` and a
    * sub-10⁹ hash, the composite key tops out near 10¹⁵ — three
    * orders inside Long. `difficulty` must be non-null. Output: input
    * columns + `tier` + `out` (1-based dense training position).
    */
  def curriculumOrder(df: DataFrame, idCol: String, difficulty: Column,
                      buckets: Int = 10, epoch: Long = 0L,
                      out: String = "train_pos"): DataFrame = {
    require(buckets >= 1 && buckets <= 1000000,
      s"buckets must be in [1, 1e6], got $buckets")
    val tiled = Ranks.ntile(
      df.withColumn("__diff", difficulty), buckets, "__diff",
      ascending = true, tiebreaks = Seq(idCol), out = "tier")
    // Ranks reads its input multiple times (the documented caller-
    // checkpoints rule): without materializing, pass 2 re-executes
    // pass 1's whole multi-shuffle ntile plan per read — measured
    // 59 s -> 25 s at soak zipf1 (checkpoint), -> fused pass below.
    val keyed = tiled.withColumn("__h",
        hashMod2(col(idCol), 1000000000L, epoch))
      .localCheckpoint(true)
    val subPerTier = math.max(1L, 64L / buckets)
    val step = (1000000000L + subPerTier - 1) / subPerTier
    val bucketed = keyed.withColumn("__b",
      (col("tier") - 1) * subPerTier + expr(s"__h div $step"))
    val counts = bucketed.groupBy(col("__b"))
      .agg(count(lit(1)).as("__cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__b")).orderBy(col("__h").asc, col(idCol).asc)
    bucketed.join(broadcast(Ranks.offsets(counts)), Seq("__b"))
      .withColumn(out, col("__off") + row_number().over(w))
      .drop("__diff", "__h", "__b", "__off")
  }

  /** Deterministic negative sampling for implicit-feedback training —
    * the pair generator behind every two-tower/BPR-style recommender:
    * positives are the observed (user, item) interactions; negatives
    * must be items the user did NOT touch, sampled reproducibly so a
    * re-run (or another engine) builds the identical training set.
    * Each user draws `k · oversample` candidate item ids from the
    * portable hash family (probe j uses seed + j — the composed-
    * sampler rule, like [[BloomJoin]]'s probes), the user's own
    * interactions are anti-joined away, and the FIRST `k` survivors
    * in probe order are kept (ties on the same candidate keep the
    * earliest probe).
    *
    * Scale shape: one distinct-users pass, a candidate explode that is
    * users × (k·oversample) rows (never users × items), one
    * (user, item)-keyed anti-join against the interactions, and a
    * per-user window over ≤ k·oversample rows. A user whose candidate
    * pool is exhausted (tiny item catalogs, heavy interactors) emits
    * FEWER than `k` negatives — raise `oversample`; silently reusing
    * positives would poison the labels. Item ids must be the dense
    * [itemBase, itemBase + nItems) domain (the catalog's surrogate
    * key): `itemBase = 0` for 0-based keys, `itemBase = 1` for the
    * 1-based keys TPC-H-style catalogs carry. A mismatched base emits
    * nonexistent item ids at one edge and can never sample the other —
    * candidates are drawn as `hashMod2(user, nItems, seed+j) +
    * itemBase`, so the base must match the catalog exactly.
    */
  def negativeSample(interactions: DataFrame, userCol: String,
                     itemCol: String, nItems: Long, k: Int,
                     oversample: Int = 3, seed: Long = 0L,
                     itemBase: Long = 0L): DataFrame = {
    require(nItems >= 1, s"nItems must be >= 1, got $nItems")
    require(k >= 1 && oversample >= 1, s"bad k=$k oversample=$oversample")
    require(itemBase >= 0L, s"itemBase must be >= 0, got $itemBase")
    val users = interactions.select(col(userCol).as("__u")).distinct()
    val cand = users.select(col("__u"),
        explode(array((0 until k * oversample).map(j =>
          struct(lit(j).as("__j"),
            (hashMod2(col("__u"), nItems, seed + j) + lit(itemBase))
              .as("__i"))): _*))
          .as("__c"))
      .select(col("__u"), col("__c.__j").as("__j"), col("__c.__i").as("__i"))
      .groupBy(col("__u"), col("__i")).agg(min(col("__j")).as("__j"))
    val negatives = cand.join(
      interactions.select(col(userCol).as("__u"), col(itemCol).as("__i")),
      Seq("__u", "__i"), "left_anti")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("__u")
      .orderBy(col("__j").asc, col("__i").asc)
    negatives.withColumn("pick_order", row_number().over(w))
      .filter(col("pick_order") <= k)
      .select(col("__u").as(userCol), col("__i").as(itemCol),
        col("pick_order"))
  }

  /** Order-quality audit for the samplers above: lag-1 Pearson
    * autocorrelation of a metric along a 1-based dense position column
    * — the number that certifies a training order actually
    * decorrelated adjacent examples. A well-shuffled order
    * ([[epochOrder]], [[curriculumOrder]] within tiers) reads ~0; a
    * `ORDER BY difficulty` order reads ~1 and feeds the model
    * near-identical difficulty runs back to back.
    *
    * Scale shape: consecutive pairs come from an EQUI-SELF-JOIN on
    * `pos + 1` — distributed on the position key, never the
    * single-task global `lag()` window the naive formulation
    * compiles to. Determinism: all five sums fold 9-dp-rounded terms
    * through the exact-decimal [[graft.Exprs.dsum]]; the correlation
    * assembles from them in one rounded expression. Output: one row
    * `(n_pairs, autocorr)`.
    */
  def orderAutocorrelation(df: DataFrame, posCol: String,
                           metric: Column): DataFrame = {
    val a = df.select(col(posCol).as("__p"),
      metric.cast("double").as("__x"))
    val pairs = a.join(
      a.select((col("__p") - 1).as("__p"), col("__x").as("__y")),
      Seq("__p"))
    val s = pairs.agg(
      count(lit(1)).as("n_pairs"),
      graft.Exprs.dsum(round(col("__x"), 9)).as("sx"),
      graft.Exprs.dsum(round(col("__y"), 9)).as("sy"),
      graft.Exprs.dsum(round(col("__x") * col("__y"), 9)).as("sxy"),
      graft.Exprs.dsum(round(col("__x") * col("__x"), 9)).as("sxx"),
      graft.Exprs.dsum(round(col("__y") * col("__y"), 9)).as("syy"))
    val n = col("n_pairs").cast("double")
    // a constant side (or a single pair) has zero variance — the
    // correlation is undefined there, not infinite: emit NULL instead
    // of an ANSI divide-by-zero
    val varx = n * col("sxx") - col("sx") * col("sx")
    val vary = n * col("syy") - col("sy") * col("sy")
    s.select(col("n_pairs"),
      when(varx > 0 && vary > 0,
        round((n * col("sxy") - col("sx") * col("sy")) /
          sqrt(varx * vary), 9)).as("autocorr"))
  }

  /** Token-budget corpus fill: keep the best-scored rows until
    * `budgetTokens` is reached — "the highest-quality N-token corpus
    * this data can give", the selection step after scoring. A row is
    * kept iff the total tokens of STRICTLY better rows (score, then
    * `idCol` asc; `bestFirst` picks the score direction) is below the
    * budget — so the row that crosses the line is included and the
    * kept set is a prefix of the quality order, never a mid-tie
    * subset. The running total is [[Ranks.prefixSum]] — bucket-
    * distributed, no single-task global window — and rides out as
    * `cum_tokens_before` (the row's start position in the filled
    * corpus, useful for curriculum ordering). Scores must be non-null
    * ([[Ranks]] contract); token counts must be non-negative for the
    * prefix to be monotone.
    */
  def budgetFill(df: DataFrame, idCol: String, tokensCol: String,
                 scoreCol: String, budgetTokens: Long,
                 bestFirst: Boolean = true): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be > 0, got $budgetTokens")
    Ranks.prefixSum(df, scoreCol, tokensCol, ascending = !bestFirst,
        tiebreaks = Seq(idCol), out = "cum_tokens_before")
      .filter(col("cum_tokens_before") < budgetTokens)
  }

  /** Score-ranked quota cap: at most `k` rows per stratum, best
    * `orderCol` first (ties broken by `tiebreaks` asc — append enough
    * to make the order total, or the cut inside a tie group is
    * engine-defined). The domain-cap curation step ("no domain
    * contributes more than k documents"), and the deterministic
    * complement of [[weightedSample]] (hash-random per stratum) —
    * here the KEPT rows are the best ones, not a random draw. The
    * ONE implementation of per-group top-k is [[Dedup.topKPerKey]]
    * (which plans as `WindowGroupLimit`: map tasks pre-trim to their
    * local top-k per stratum before the exchange, so a corpus-scale
    * stratum never funnels whole); this is its sampler-facing
    * direction/tiebreak convention, not a second window.
    */
  def quotaPerStratum(df: DataFrame, stratumCol: String, orderCol: String,
                      k: Int, bestFirst: Boolean = true,
                      tiebreaks: Seq[String] = Seq.empty): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val ord = (if (bestFirst) col(orderCol).desc else col(orderCol).asc) +:
      tiebreaks.map(col(_).asc)
    Dedup.topKPerKey(df, Seq(stratumCol), ord, k)
  }

  /** Keep ~`permille`/1000 of rows, uniformly and deterministically.
    * Distinct default seed: see [[hashMod2]] — composing with any other
    * sampler in this file multiplies rates instead of intersecting
    * buckets.
    */
  def hashSample(df: DataFrame, idCol: String, permille: Int,
                 seed: Long = 15485863L): DataFrame =
    df.filter(bucket1000(col(idCol), seed) < permille)

  /** Deterministic, disjoint, exhaustive corpus split (train/val/test):
    * every row gets exactly one label from its id-hash permille bucket,
    * cut at the cumulative bounds of `splits` (label → permille, must
    * sum to 1000). A pure narrow projection — same assignment on any
    * cluster size, file split, or engine, and stable across reruns, so
    * eval rows can never leak into training when the corpus is rebuilt.
    *
    * The bucket hash is a TWO-round INPUT-shifted multiplicative hash —
    * a different functional form from the samplers' multiplier-seeded
    * [[hashMod2]], and measured independent of it (a hash-sampled
    * subset splits 80/10/10, not into one split; the unit test proves
    * the single-round failure mode). The formula is deliberately frozen
    * (engine-portable, embedded verbatim in downstream oracles), so
    * split assignments never move across releases.
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
    * Strata absent from the map are dropped (quota 0). Rates are
    * fractional permille (e.g. `0.5` keeps 1 row in 2000): the verdict
    * is drawn at parts-per-million granularity ([[bucketPpm]]), so a
    * sub-1‰ stratum is thinned, not silently dropped.
    */
  def stratifiedHashSample(df: DataFrame, idCol: String, stratumCol: String,
                           permille: Map[String, Double],
                           seed: Long = 32452843L): DataFrame = {
    require(permille.values.forall(v => v >= 0 && v <= 1000),
      "stratum permilles must be in [0, 1000]")
    val quota = permille.foldLeft(lit(0L)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(math.floor(v * 1000).toLong)).otherwise(acc)
    }
    df.filter(bucketPpm(col(idCol), seed) < quota)
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
                     stratumCol: String, k: Int,
                     seed: Long = 49979687L): DataFrame = {
    val u = (hashMod2(col(idCol), 1000000L, seed).cast("double") + 0.5) / 1000000.0
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
    * `floor(1e6·w·T/count)` parts-per-million of its rows via the
    * deterministic id hash ([[bucketPpm]] — at permille granularity a
    * stratum whose correct rate is below 1‰ would floor to 0 and be
    * silently DROPPED, shifting the mixture). Fully declarative:
    * stratum counts are an aggregate, the global minimum is a one-row
    * cross join, and the rates join back on the stratum key (strata
    * counts are small — AQE broadcasts them) — no driver-side collect,
    * so it composes lazily into larger plans. Strata without a target
    * weight are dropped.
    */
  def mixtureSample(df: DataFrame, idCol: String, stratumCol: String,
                    weights: Map[String, Double],
                    seed: Long = 67867967L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val w = weights.toSeq.toDF(stratumCol, "__w")
    val counts = df.groupBy(stratumCol)
      .agg(count(lit(1)).cast("double").as("__cnt"))
      .join(w, stratumCol)
    val tmax = counts.agg(min(col("__cnt") / col("__w")).as("__tmax"))
    val rates = counts.crossJoin(tmax)
      .select(col(stratumCol),
        floor(lit(1000000) * col("__w") * col("__tmax") / col("__cnt"))
          .as("__ppm"))
    df.join(rates, stratumCol)
      .filter(bucketPpm(col(idCol), seed) < col("__ppm"))
      .drop("__ppm")
  }

  /** Leakage-safe train/val/test split: near-duplicate documents MUST
    * land in the same split — a paraphrase of a training doc sitting in
    * the eval split is contamination that [[hashSplit]] on raw ids
    * cannot see. Dedup-pair edges collapse to connected components
    * ([[ConnectedComponents]], the same clusters the dedup pass
    * already computes) and the split verdict hashes the CLUSTER
    * representative, so every member of a near-dup cluster draws the
    * same bucket; singleton docs (no edges) hash their own id,
    * degenerating to exactly [[hashSplit]]. Shares stay approximate at
    * the cluster granularity (a whole cluster moves together — the
    * price of zero cross-split leakage).
    *
    * Scale: the CC cost is the dedup pipeline's own (run it once,
    * reuse the pair table); the split itself is a narrow left join on
    * the component table plus the frozen split hash.
    */
  def clusterSafeSplit(df: DataFrame, idCol: String, edges: DataFrame,
                       splits: Seq[(String, Int)], splitCol: String = "split",
                       seed: Long = 7919L, edgeSrc: String = "id1",
                       edgeDst: String = "id2"): DataFrame = {
    val comps = ConnectedComponents.components(edges, edgeSrc, edgeDst)
      .select(col("id").as(idCol), col("component").as("__grp0"))
    val keyed = df.join(comps, Seq(idCol), "left")
      .withColumn("__grp", coalesce(col("__grp0"), col(idCol)))
      .drop("__grp0")
    hashSplit(keyed, "__grp", splits, splitCol, seed).drop("__grp")
  }

  /** Temperature-based domain reweighting: sample stratum `s` at a rate
    * proportional to `p_s^alpha` where `p_s` is the stratum's natural
    * share — the exponentiated-smoothing mix used by multilingual and
    * multi-domain LLM corpus recipes. `alpha = 1` keeps the natural
    * distribution (every row), `alpha = 0` equalizes strata (the
    * cluster-balance limit), and intermediate values upweight
    * low-resource strata without flattening the mix entirely. The
    * maximum-volume realization keeps `(cnt_min / cnt_s)^(1-alpha)` of
    * each stratum (the smallest stratum keeps everything), applied via
    * the deterministic ppm hash so the sample is engine-portable. The
    * single `pow` is the only non-IEEE-exact step (libm vs JVM can
    * differ in the last ulp), so the ppm rate is rounded to 6 decimals
    * before flooring — same guard as [[weightedSample]]'s `ln`.
    * Declarative end-to-end: counts aggregate, one-row global min cross
    * join, rate join back on the stratum key (AQE broadcasts it) — no
    * driver collect, composes lazily.
    */
  def temperatureSample(df: DataFrame, idCol: String, stratumCol: String,
                        alpha: Double, seed: Long = 86028121L): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0, 1], got $alpha")
    val counts = df.groupBy(stratumCol)
      .agg(count(lit(1)).cast("double").as("__cnt"))
    val cmin = counts.agg(min(col("__cnt")).as("__cmin"))
    val rates = counts.crossJoin(cmin)
      .select(col(stratumCol),
        floor(round(pow(col("__cmin") / col("__cnt"), lit(1.0 - alpha))
          * lit(1000000.0), 6)).as("__ppm"))
    df.join(rates, stratumCol)
      .filter(bucketPpm(col(idCol), seed) < col("__ppm"))
      .drop("__ppm")
  }

  /** The PLANNING face of domain mixing — the per-source epoch table
    * an LLM training recipe publishes (how many tokens, and how many
    * passes over each source, to realize target weights within a
    * token budget): `(source, n_tokens, weight_ppm, target_tokens,
    * epochs_ppm)` where `epochs_ppm > 1,000,000` means the source is
    * UPSAMPLED (multiple epochs) — the regime [[mixtureSample]]'s
    * row-level downsampling cannot express. Weights are normalized
    * over the sources present in BOTH the counts and the map
    * (missing-weight sources are dropped, the mixtureSample rule).
    *
    * Determinism: weights sum in exact DECIMAL (double summation is
    * order-dependent), the one normalization is a single IEEE
    * division of identical operands, and everything downstream of the
    * floored `weight_ppm` is pure integer arithmetic — the schedule
    * hash-compares across engines. The no-partition sum window runs
    * over the SOURCE table (rows = domain vocabulary, never data).
    *
    * Edge guards: a zero-token source is DROPPED (it has no finite
    * epoch count — Spark's `div` would read NULL where DuckDB errors,
    * an engine divergence either way), and both integer products run
    * through DECIMAL(38,0) — `budgetTokens * weight_ppm` overflows
    * Long above a ~9.2e12-token budget, well inside the stated LLM
    * use case — with the `div` results landing back in BIGINT.
    */
  def mixtureSchedule(tokenCounts: DataFrame, sourceCol: String,
                      tokensCol: String, weights: Map[String, Double],
                      budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be > 0, got $budgetTokens")
    val spark = tokenCounts.sparkSession
    import spark.implicits._
    val w = weights.toSeq.toDF(sourceCol, "__w")
      .select(col(sourceCol), col("__w").cast("decimal(18,6)").as("__w"))
    val all = org.apache.spark.sql.expressions.Window.partitionBy()
    tokenCounts
      .select(col(sourceCol), col(tokensCol).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .join(w, sourceCol)
      .withColumn("__sumw", sum(col("__w")).over(all))
      .select(col(sourceCol), col("n_tokens"),
        floor(lit(1000000.0) *
          (col("__w").cast("double") / col("__sumw").cast("double")))
          .cast("long").as("weight_ppm"))
      .withColumn("target_tokens",
        expr(s"CAST(${budgetTokens}L AS DECIMAL(38,0)) * weight_ppm div 1000000L"))
      .withColumn("epochs_ppm",
        expr("CAST(target_tokens AS DECIMAL(38,0)) * 1000000L div n_tokens"))
  }
}
