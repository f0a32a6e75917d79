package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class AgreementSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("cohen kappa matches the textbook 2x2 worked example") {
    // grid: 20 yes/yes, 15 no/no, 5 yes/no, 10 no/yes -> n=50, po=0.7,
    // pe = (25*30 + 25*20) / 2500 = 0.5, kappa = (0.7-0.5)/0.5 = 0.4
    val rows =
      Seq.fill(20)(("yes", "yes")) ++ Seq.fill(15)(("no", "no")) ++
      Seq.fill(5)(("yes", "no")) ++ Seq.fill(10)(("no", "yes"))
    val got = Agreement.cohenKappa(rows.toDF("ra", "rb"), "ra", "rb")
      .as[(Long, Double, Double, Double)].collect().head
    assert(got == ((50L, 0.7, 0.5, 0.4)))
  }

  test("cohen: perfect agreement is kappa 1; null ratings are excluded") {
    val rows = Seq(("a", "a"), ("b", "b"), ("c", "c"),
      (null, "a"), ("b", null)).toDF("ra", "rb")
    val got = Agreement.cohenKappa(rows, "ra", "rb")
      .as[(Long, Double, Double, Double)].collect().head
    assert(got._1 == 3L && got._2 == 1.0 && got._4 == 1.0)
  }

  test("cohen: agreement exactly at chance is kappa 0") {
    // both raters 50/50, independent: po = 0.5 = pe
    val rows = Seq(("y", "y"), ("y", "n"), ("n", "y"), ("n", "n"))
      .toDF("ra", "rb")
    val got = Agreement.cohenKappa(rows, "ra", "rb")
      .as[(Long, Double, Double, Double)].collect().head
    assert(got._2 == 0.5 && got._3 == 0.5 && got._4 == 0.0)
  }

  test("cohen: both raters constant (pe=1) pins kappa to NULL, not NaN") {
    // the degenerate case hit during q232 development: chance
    // agreement is total, the denominator vanishes, kappa is
    // mathematically undefined — pinned to an explicit NULL
    val rows = Seq.fill(5)(("x", "x")).toDF("ra", "rb")
    val got = Agreement.cohenKappa(rows, "ra", "rb").collect().head
    assert(got.getLong(0) == 5L)
    assert(got.getDouble(1) == 1.0 && got.getDouble(2) == 1.0)
    assert(got.isNullAt(3), "kappa at pe=1 must be NULL, not NaN")
  }

  test("fleiss kappa: hand-computed 3-item 2-rater panel") {
    // i1: both a (P=1); i2: both b (P=1); i3: split (P=0) -> Pbar=2/3;
    // pooled p_a = p_b = 1/2 -> Pe = 1/2; kappa = (2/3-1/2)/(1/2) = 1/3
    val ratings = Seq((1, "a"), (1, "a"), (2, "b"), (2, "b"),
      (3, "a"), (3, "b")).toDF("item", "cat")
    val got = Agreement.fleissKappa(ratings, "item", "cat", m = 2)
      .as[(Long, Double, Double, Double)].collect().head
    assert(got._1 == 3L)
    assert(math.abs(got._2 - 2.0 / 3) < 1e-9)
    assert(got._3 == 0.5)
    assert(math.abs(got._4 - 1.0 / 3) < 1e-9)
  }

  test("fleiss: ragged panels are excluded, not fatal") {
    val ratings = Seq((1, "a"), (1, "a"), (2, "b"), (2, "b"),
      (3, "a"), (3, "b"),
      (4, "a"), // one lone rating: dropped
      (5, "a"), (5, "a"), (5, "a")) // three ratings: dropped for m=2
      .toDF("item", "cat")
    val got = Agreement.fleissKappa(ratings, "item", "cat", m = 2)
      .as[(Long, Double, Double, Double)].collect().head
    assert(got._1 == 3L, "items 4 and 5 must not enter the panel")
    assert(math.abs(got._4 - 1.0 / 3) < 1e-9, "same kappa as clean panel")
  }

  test("fleiss: unanimous panel is kappa 1") {
    val ratings = Seq((1, "a"), (1, "a"), (1, "a"),
      (2, "b"), (2, "b"), (2, "b")).toDF("item", "cat")
    val got = Agreement.fleissKappa(ratings, "item", "cat", m = 3)
      .as[(Long, Double, Double, Double)].collect().head
    assert(got._2 == 1.0 && got._4 == 1.0)
  }

  test("fleiss: single-category panel (pe=1) pins kappa to NULL") {
    // every rating in one category: p_bar = pe = 1, kappa undefined
    val ratings = Seq((1, "a"), (1, "a"), (2, "a"), (2, "a"))
      .toDF("item", "cat")
    val got = Agreement.fleissKappa(ratings, "item", "cat", m = 2)
      .collect().head
    assert(got.getLong(0) == 2L && got.getDouble(2) == 1.0)
    assert(got.isNullAt(3), "kappa at pe=1 must be NULL, not NaN")
  }

  test("krippendorff alpha: hand-worked ragged panel") {
    // A: [a,a]  B: [a,b]  C: [b] (single rating -> excluded by the math)
    // pairable n=4; Do = (0 + 2)/4 = 0.5; pooled a=3, b=1 ->
    // De = (12 - 6)/12 = 0.5; alpha = 1 - 0.5/0.5 = 0
    val ratings = Seq(("A", "a"), ("A", "a"), ("B", "a"), ("B", "b"),
      ("C", "b")).toDF("item", "cat")
    val r = Agreement.krippendorffAlpha(ratings, "item", "cat")
      .as[(Long, Long, Double, Double, Option[Double])].collect().head
    assert(r == ((2L, 4L, 0.5, 0.5, Some(0.0))))
  }

  test("krippendorff alpha: perfect ragged agreement scores 1") {
    // raggedness by design: one 2-panel, one 3-panel, one abstention
    val ratings = Seq(("A", "a"), ("A", "a"),
      ("B", "b"), ("B", "b"), ("B", "b"),
      ("C", "a")).toDF("item", "cat")
    val r = Agreement.krippendorffAlpha(ratings, "item", "cat")
      .as[(Long, Long, Double, Double, Option[Double])].collect().head
    assert(r._1 == 2L && r._2 == 5L)
    assert(r._3 == 0.0 && r._5.contains(1.0))
  }

  test("krippendorff alpha: one category everywhere -> NULL, not NaN") {
    val ratings = Seq(("A", "a"), ("A", "a"), ("B", "a"), ("B", "a"))
      .toDF("item", "cat")
    val r = Agreement.krippendorffAlpha(ratings, "item", "cat")
      .as[(Long, Long, Double, Double, Option[Double])].collect().head
    assert(r._4 == 0.0 && r._5.isEmpty)
  }

  test("krippendorff alpha: null categories and singletons drop together") {
    val ratings = Seq(("A", Some("a")), ("A", Some("b")), ("A", None),
      ("D", Some("a"))).toDF("item", "cat")
    val r = Agreement.krippendorffAlpha(ratings, "item", "cat")
      .as[(Long, Long, Double, Double, Option[Double])].collect().head
    // A keeps 2 non-null ratings; D is a singleton
    assert(r._1 == 1L && r._2 == 2L && r._3 == 1.0)
  }
}
