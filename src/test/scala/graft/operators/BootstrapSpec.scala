package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class BootstrapSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("bootstrapMeanCI: deterministic, ordered interval, full shape") {
    val df = (1L to 500L).map(i => (i, (i % 97).toDouble + 10.0))
      .toDF("id", "v")
    val run = () => Experiment.bootstrapMeanCI(df, col("id"), col("v"),
      b = 64, seed = 7L).as[(Long, Double, Double, Double, Long)]
      .collect().head
    val r1 = run()
    assert(r1 == run()) // pure function of the data: rerun identical
    assert(r1._1 == 500L && r1._5 == 64L)
    assert(r1._3 <= r1._4) // ci_lo <= ci_hi
    // the replicate spread brackets the overall mean on benign data
    assert(r1._3 <= r1._2 && r1._2 <= r1._4)
  }

  test("bootstrapMeanCI: constant column collapses the interval to the mean") {
    val df = (1L to 200L).map(i => (i, 42.5)).toDF("id", "v")
    val r = Experiment.bootstrapMeanCI(df, col("id"), col("v"), b = 32,
      seed = 3L).as[(Long, Double, Double, Double, Long)].collect().head
    assert(r._2 == 42.5 && r._3 == 42.5 && r._4 == 42.5)
    assert(r._5 == 32L)
  }

  test("bootstrapMeanCI: id 0 hashes to weight 0 everywhere -> b_eff 0, NULL ci") {
    // the portable hash of id 0 is 0 for every seed, so every
    // replicate's only weight is Poisson-cell 0 — the all-zero-weight
    // replicate exclusion and the one-row degenerate shape, pinned
    val df = Seq((0L, 5.0)).toDF("id", "v")
    val rows = Experiment.bootstrapMeanCI(df, col("id"), col("v"),
      b = 8, seed = 0L).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) == 1L && r.getDouble(1) == 5.0)
    assert(r.isNullAt(2) && r.isNullAt(3) && r.getLong(4) == 0L)
  }

  test("bootstrapMeanCI: empty input keeps the one-row NULL shape") {
    val empty = Seq.empty[(Long, Double)].toDF("id", "v")
    val rows = Experiment.bootstrapMeanCI(empty, col("id"), col("v"))
      .collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) == 0L && r.isNullAt(1) && r.isNullAt(2) &&
      r.isNullAt(3) && r.getLong(4) == 0L)
  }
}
