package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class QualityClassifierSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // pos: "good good the" + "good the"  -> c_pos: good=3, the=2, n_pos=5
  // neg: "bad the" + "bad bad the a"   -> c_neg: bad=3, the=2, a=1, n_neg=6
  // vocabulary v=4
  private def corpus = Seq(
    (1L, "good good the", true), (2L, "good the", true),
    (3L, "bad the", false), (4L, "bad bad the a", false)
  ).toDF("doc_id", "text", "is_pos")

  private def lo(cp: Long, cn: Long, np: Long, nn: Long, v: Long): Double =
    BigDecimal(math.log(((cp + 1.0) / (np + v)) / ((cn + 1.0) / (nn + v))))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("nbTrain: exact smoothed counts and 9dp log-odds") {
    val m = QualityClassifier.nbTrain(corpus, "text", col("is_pos"))
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(m.keySet == Set("good", "the", "bad", "a"))
    assert(m("good")._1 == 3L && m("good")._2 == 0L)
    assert(m("bad")._1 == 0L && m("bad")._2 == 3L)
    assert(m("good")._3 === lo(3, 0, 5, 6, 4))
    assert(m("bad")._3 === lo(0, 3, 5, 6, 4))
    assert(m("the")._3 === lo(2, 2, 5, 6, 4))
    assert(m("a")._3 === lo(0, 1, 5, 6, 4))
    // signs: class-discriminating tokens point the right way
    assert(m("good")._3 > 0 && m("bad")._3 < 0)
  }

  test("nbScore: tf-weighted decimal sum + OOV fallback weight") {
    val model = QualityClassifier.nbTrain(corpus, "text", col("is_pos"))
    val docs = Seq((10L, "good zzz")).toDF("doc_id", "text")
    val got = QualityClassifier.nbScore(docs, "doc_id", "text", model)
      .as[(Long, Long, Double)].collect().head
    // each term is quantized to DECIMAL(18,6) before the sum (dsum)
    def q6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = q6(lo(3, 0, 5, 6, 4)) + q6(lo(0, 0, 5, 6, 4))
    assert(got._1 == 10L && got._2 == 2L)
    assert(math.abs(got._3 - expected) < 1e-9)
  }

  test("nbScore: training docs separate by score sign") {
    val model = QualityClassifier.nbTrain(corpus, "text", col("is_pos"))
    val scores = QualityClassifier
      .nbScore(corpus, "doc_id", "text", model)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(scores(1L) > 0 && scores(2L) > 0)
    assert(scores(3L) < 0 && scores(4L) < 0)
  }

  test("tokenFeatures: exact integer features") {
    val f = QualityClassifier.tokenFeatures(
      Seq((1L, "the cat the")).toDF("doc_id", "text"), "doc_id", "text",
      marker = "the").as[(Long, Long, Long, Long, Long)].collect().head
    assert(f == ((1L, 1L, 3L, 2L, 2L)))
  }

  test("perceptronTrain: exact epoch-by-epoch updates (lr=1, from 0)") {
    // A:(1,3,y=+1) B:(1,1,y=-1); hand-rolled epochs:
    //   e1: both mis (margin 0) -> w=(0,2)
    //   e2: B mis               -> w=(-1,1)
    //   e3: B mis (margin 0)    -> w=(-2,0)
    val feats = Seq((1L, 1L, 3L, 1L), (2L, 1L, 1L, -1L))
      .toDF("id", "x0", "x1", "y")
    val cols = Seq("x0", "x1")
    assert(QualityClassifier.perceptronTrain(feats, "y", cols, 1).toSeq
      == Seq(0L, 2L))
    assert(QualityClassifier.perceptronTrain(feats, "y", cols, 2).toSeq
      == Seq(-1L, 1L))
    assert(QualityClassifier.perceptronTrain(feats, "y", cols, 3).toSeq
      == Seq(-2L, 0L))
  }

  test("perceptron: converges on separable data and stays a fixed point") {
    val feats = Seq(
      (1L, 1L, 5L, 1L), (2L, 1L, 6L, 1L),
      (3L, 1L, 0L, -1L), (4L, 1L, 1L, -1L)
    ).toDF("id", "x0", "x1", "y").localCheckpoint(true)
    val cols = Seq("x0", "x1")
    val w7 = QualityClassifier.perceptronTrain(feats, "y", cols, 7)
    assert(w7.toSeq == Seq(-6L, 5L))
    // converged: an extra epoch is a no-op
    assert(QualityClassifier.perceptronTrain(feats, "y", cols, 8).toSeq
      == w7.toSeq)
    val preds = QualityClassifier.perceptronScore(feats, cols, w7)
      .select(col("id"), col("pred"), col("y") === 1).collect()
    preds.foreach(r => assert(r.getBoolean(1) == r.getBoolean(2)))
  }

  test("preferencePairs: best/worst per group, gap + self-pair filters") {
    val scored = Seq(
      // group A: clear spread -> (1 chosen, 3 rejected), gap 4.0
      ("A", 1L, 5.0), ("A", 2L, 3.0), ("A", 3L, 1.0),
      // group B: uniform (gap 0 < minGap) -> nothing
      ("B", 4L, 2.0), ("B", 5L, 2.0),
      // group C: single doc -> self-pair suppressed
      ("C", 6L, 9.0)
    ).toDF("g", "id", "score")
    val got = QualityClassifier
      .preferencePairs(scored, Seq("g"), "id", "score", minGap = 0.5)
      .select("g", "chosen_id", "rejected_id", "gap")
      .as[(String, Long, Long, Double)].collect()
    assert(got.toSeq == Seq(("A", 1L, 3L, 4.0)))
  }

  test("preferencePairs: score ties break by ascending id on both ends") {
    val scored = Seq(
      ("A", 2L, 5.0), ("A", 1L, 5.0), ("A", 9L, 1.0), ("A", 8L, 1.0)
    ).toDF("g", "id", "score")
    val got = QualityClassifier
      .preferencePairs(scored, Seq("g"), "id", "score", minGap = 0.5)
      .select("chosen_id", "rejected_id").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 8L)))
  }

  test("calibrationBins: equal-count bins, exact rates and decimal means") {
    val scored = (1 to 10).map(i => (i.toLong, i.toDouble, i > 5))
      .toDF("id", "score", "y").localCheckpoint(true)
    val got = QualityClassifier
      .calibrationBins(scored, "id", "score", "y", bins = 2)
      .select("bin", "n", "n_pos", "mean_score", "pos_rate")
      .as[(Long, Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 5L, 0L, 3.0, 0.0), (2L, 5L, 5L, 8.0, 1.0)))
  }

  test("aucExact: midrank tie correction matches the pairwise definition") {
    // pos {0.9, 0.5}, neg {0.5, 0.1}: wins 3, ties 1 -> (3+0.5)/4 = 0.875
    val scored = Seq((0.9, true), (0.5, true), (0.5, false), (0.1, false))
      .toDF("score", "y")
    val r = QualityClassifier.aucExact(scored, "score", "y")
      .as[(Long, Long, Double)].collect().head
    assert(r == ((2L, 2L, 0.875)))
  }

  test("aucExact: perfect separation 1.0, all-ties 0.5") {
    val perfect = Seq((2.0, true), (1.9, true), (0.2, false), (0.1, false))
      .toDF("score", "y")
    assert(QualityClassifier.aucExact(perfect, "score", "y")
      .select("auc").as[Double].collect().head == 1.0)
    val ties = Seq((1.0, true), (1.0, true), (1.0, false))
      .toDF("score", "y")
    assert(QualityClassifier.aucExact(ties, "score", "y")
      .select("auc").as[Double].collect().head == 0.5)
  }

  test("aucExact: single-class input yields NULL auc, not Infinity") {
    val onlyPos = Seq((1.0, true), (2.0, true)).toDF("score", "y")
    val r = QualityClassifier.aucExact(onlyPos, "score", "y").collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 0L && r.isNullAt(2))
  }

  test("perceptronTrain: an empty feature frame is a no-op, not an NPE") {
    val empty = Seq.empty[(Long, Long, Long)].toDF("x0", "x1", "y")
    assert(QualityClassifier
      .perceptronTrain(empty, "y", Seq("x0", "x1"), 2).toSeq
      == Seq(0L, 0L))
  }

  test("preferencePairs plan pin: rank-1 windows compile to WindowGroupLimit") {
    // the scale claim: each top-1 window is found map-side (one row
    // per group reaches the exchange), not by sorting whole groups
    val scored = Seq(("A", 1L, 5.0), ("A", 2L, 3.0), ("B", 3L, 1.0))
      .toDF("g", "id", "score")
    val plan = QualityClassifier
      .preferencePairs(scored, Seq("g"), "id", "score", minGap = 0.0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"top-1 windows must compile to WindowGroupLimit:\n${plan.take(2000)}")
  }
}
