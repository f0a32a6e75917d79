package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class MarketBasketSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // baskets: {A,B,C}, {A,B}, {A,C}, {B,C}, {A,B,D}
  private def baskets = Seq(
    (1L, 10L), (1L, 20L), (1L, 30L),
    (2L, 10L), (2L, 20L),
    (3L, 10L), (3L, 30L),
    (4L, 20L), (4L, 30L),
    (5L, 10L), (5L, 20L), (5L, 40L)).toDF("bk", "it")

  test("rules carry exact counts and ppm metrics") {
    val out = MarketBasket.associationRules(baskets, "bk", "it",
      minPairCount = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap

    // pair (10,20) in baskets 1,2,5 → pc=3; |10|=4, |20|=4, n=5
    val r = out((10L, 20L))
    assert(r.getAs[Long]("pair_count") == 3L)
    assert(r.getAs[Long]("antecedent_count") == 4L)
    assert(r.getAs[Long]("consequent_count") == 4L)
    assert(r.getAs[Long]("n_baskets") == 5L)
    assert(r.getAs[Long]("support_ppm") == 3L * 1000000L / 5L)
    assert(r.getAs[Long]("confidence_ppm") == 3L * 1000000L / 4L)
    assert(r.getAs[Long]("lift_ppm") == 3L * 5L * 1000000L / 16L)

    // both directions exist and are mirror images on counts
    val rev = out((20L, 10L))
    assert(rev.getAs[Long]("pair_count") == 3L)
    assert(rev.getAs[Long]("confidence_ppm") == 3L * 1000000L / 4L)

    // pair (10,40) occurs once → pruned by minPairCount=2
    assert(!out.contains((10L, 40L)) && !out.contains((40L, 10L)))
    // every unordered pair appears exactly twice (once per direction)
    val undirected = out.keySet.map { case (a, b) =>
      (math.min(a, b), math.max(a, b)) }
    assert(out.size == undirected.size * 2)
  }

  test("duplicate items within a basket count once") {
    val dup = baskets.unionByName(Seq((1L, 10L), (1L, 10L)).toDF("bk", "it"))
    val a = MarketBasket.associationRules(dup, "bk", "it", minPairCount = 2)
      .orderBy("antecedent", "consequent").collect().map(_.toSeq).toSeq
    val b = MarketBasket.associationRules(baskets, "bk", "it", minPairCount = 2)
      .orderBy("antecedent", "consequent").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("maxBasketSize drops mega-baskets before pair generation") {
    val mega = (1 to 50).map(i => (99L, 1000L + i)).toDF("bk", "it")
    val out = MarketBasket.associationRules(baskets.unionByName(mega),
      "bk", "it", minPairCount = 2, maxBasketSize = 10)
      .filter(col("antecedent") >= 1000L)
    assert(out.count() == 0)
    // and the capped run matches the run that never saw the mega-basket
    // on every surviving rule except n_baskets-derived ppm (the mega
    // basket is excluded from the basket universe too)
    val capped = MarketBasket.associationRules(baskets.unionByName(mega),
      "bk", "it", minPairCount = 2, maxBasketSize = 10)
      .orderBy("antecedent", "consequent").collect().map(_.toSeq).toSeq
    val clean = MarketBasket.associationRules(baskets, "bk", "it",
      minPairCount = 2)
      .orderBy("antecedent", "consequent").collect().map(_.toSeq).toSeq
    assert(capped == clean)
  }

  test("plan shape: shared basket exchange, broadcast dims, no cartesian") {
    val out = MarketBasket.associationRules(baskets, "bk", "it",
      minPairCount = 2)
    out.collect() // finalize AQE so exchange reuse is visible in the plan
    graft.audit.PlanGuard.assertNoCartesian(out)
    // one basket-key exchange (reused by distinct, cap window, both
    // self-join sides, basket count) + pair-count exchange + item-count
    // exchange + the single-row basket-total reduce
    graft.audit.PlanGuard.assertMaxExchanges(out, 4)
  }
}
