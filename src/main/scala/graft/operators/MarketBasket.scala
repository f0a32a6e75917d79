package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise frequent-itemset mining + association rules (support /
  * confidence / lift) over transaction baskets — the canonical
  * e-commerce "bought X also bought Y" analytic (beyond the reference,
  * which stops at per-category aggregates).
  *
  * Shape chosen for 100 TB:
  *   - Candidate pairs come from a basket-key equi-SELF-join, never an
  *     item-item cross product: the join fans out per basket, and
  *     basket size is bounded by order size (TPC-H ~7 lines), so the
  *     pair count is O(N · maxBasket), not O(items²).
  *   - The basket table is hash-partitioned by basket key ONCE; the
  *     within-basket distinct (grouping on a superset of the
  *     partitioning key), both self-join sides (exchange reuse), and
  *     the basket-count aggregate all ride that single exchange.
  *   - Item frequencies are a small dimension (one row per catalog
  *     item) and broadcast into the rule assembly.
  *   - All three rule metrics are exact BIGINT parts-per-million
  *     (floor division), the same cross-engine-deterministic trick as
  *     the samplers: no floating-point division can drift between
  *     engines or partition orders.
  *
  * Mega-basket skew: a pathological basket of B items makes B² pairs.
  * `maxBasketSize` drops baskets above the bound before the self-join
  * (the same O(cap·N) insurance the LSH bucket cap buys), counted from
  * the same single exchange.
  */
object MarketBasket {

  /** Association rules over (basket, item) rows. Emits one row per
    * ordered rule a→b with pair/antecedent/consequent counts and
    * support/confidence/lift in exact ppm.
    *
    * @param minPairCount  keep rules whose unordered pair occurs in at
    *                      least this many baskets (support pruning —
    *                      applied BEFORE the dimension joins)
    * @param maxBasketSize drop degenerate baskets larger than this
    *                      before pair generation
    */
  def associationRules(df: DataFrame, basketCol: String, itemCol: String,
                       minPairCount: Long = 2,
                       maxBasketSize: Int = 1000): DataFrame = {
    val items0 = df.select(col(basketCol).as("__bk"), col(itemCol).as("__it"))
      .repartition(col("__bk"))
      .groupBy("__bk", "__it").agg(count(lit(1)).as("__dup"))
      .drop("__dup")

    // Basket-size cap: a window count over the basket key shares the
    // basket-key exchange (same shape as the LSH bucket cap).
    val w = org.apache.spark.sql.expressions.Window.partitionBy("__bk")
    val items = items0
      .withColumn("__bsz", count(lit(1)).over(w))
      .filter(col("__bsz") <= maxBasketSize)
      .drop("__bsz")

    val nBaskets = items.agg(countDistinct(col("__bk")).as("n_baskets"))

    val itemCnt = items.groupBy(col("__it")).agg(count(lit(1)).as("__c"))

    // Directed pairs in ONE pass (x != y, both orientations counted by
    // the same aggregate): a `<`-filtered pass plus a union would plan
    // the whole pair subtree twice — double the exchanges for the same
    // rows into the final aggregate.
    val a = items.toDF("__bk", "antecedent")
    val b = items.toDF("__bk", "consequent")
    val rules = a.join(b, Seq("__bk"))
      .filter(col("antecedent") =!= col("consequent"))
      .groupBy("antecedent", "consequent")
      .agg(count(lit(1)).as("pair_count"))
      .filter(col("pair_count") >= minPairCount)

    rules
      .join(broadcast(itemCnt.select(col("__it").as("antecedent"),
        col("__c").as("antecedent_count"))), Seq("antecedent"))
      .join(broadcast(itemCnt.select(col("__it").as("consequent"),
        col("__c").as("consequent_count"))), Seq("consequent"))
      .crossJoin(broadcast(nBaskets))
      .select(col("antecedent"), col("consequent"), col("pair_count"),
        col("antecedent_count"), col("consequent_count"), col("n_baskets"),
        expr("pair_count * 1000000L div n_baskets").as("support_ppm"),
        expr("pair_count * 1000000L div antecedent_count").as("confidence_ppm"),
        // lift's numerator multiplies two corpus-scale counts — in
        // BIGINT it wraps silently past ~9.2e18 (a few million baskets
        // with a frequent pair), so both products run in DECIMAL(38,0);
        // IntegralDivide(decimal, decimal) returns BIGINT, keeping the
        // output schema and the oracle's integer ppm contract unchanged.
        expr("CAST(pair_count AS DECIMAL(38,0)) * n_baskets * 1000000 div " +
          "(CAST(antecedent_count AS DECIMAL(38,0)) * consequent_count)")
          .as("lift_ppm"))
  }
}
