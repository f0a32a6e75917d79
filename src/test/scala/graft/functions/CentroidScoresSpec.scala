package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class CentroidScoresSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val centroids: Seq[Seq[Double]] =
    Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 2.0, 0.0), Seq(1.0, 1.0, 1.0))

  private def df = Seq(
    (1L, Array(1.0, 2.0, 3.0)),
    (2L, Array(-1.0, 0.5, 0.0))
  ).toDF("id", "v")

  test("scores equal hand-computed dot/|c| per centroid") {
    val got = df.select($"id",
        CentroidScores.scores($"v", typedlit(centroids)).as("sc"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def expect(v: Array[Double]): Seq[Double] = centroids.map { c =>
      val dot = v.zip(c).map { case (a, b) => a * b }.sum
      dot / math.sqrt(c.map(x => x * x).sum)
    }
    assert(got(1L) == expect(Array(1.0, 2.0, 3.0)))
    assert(got(2L) == expect(Array(-1.0, 0.5, 0.0)))
  }

  test("interpreted (non-codegen) path agrees with codegen") {
    val sel = df.select($"id",
      CentroidScores.scores($"v", typedlit(centroids)).as("sc"))
    val withCodegen = sel.collect().map(_.toString).toSeq
    val prev = spark.conf.getOption("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpreted = sel.collect().map(_.toString).toSeq
      assert(interpreted == withCodegen)
    } finally prev.foreach(spark.conf.set("spark.sql.codegen.wholeStage", _))
  }

  test("null vector yields null scores") {
    val d = Seq((1L, Option.empty[Array[Double]])).toDF("id", "v")
    val r = d.select(CentroidScores.scores($"v", typedlit(centroids))).collect()
    assert(r.head.isNullAt(0))
  }
}
