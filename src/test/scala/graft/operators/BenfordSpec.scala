package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class BenfordSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // A Benford-perfect population: digit d appears round(1000·log10(1+1/d))
  // times as the leading digit (301, 176, 125, 97, 79, 67, 58, 51, 46).
  private def benfordRows: Seq[(String, Double)] = {
    val counts = (1 to 9).map(d =>
      d -> math.round(1000 * math.log10(1.0 + 1.0 / d)).toInt)
    counts.flatMap { case (d, n) =>
      (0 until n).map(i => ("ok", d * 100.0 + (i % 90) + 0.25))
    }
  }

  // A fabricated population: every leading digit equally likely — the
  // uniform-first-digit signature of invented amounts.
  private def uniformRows: Seq[(String, Double)] =
    (1 to 9).flatMap(d => (0 until 111).map(i => ("fab", d * 10.0 + i % 9)))

  test("conforming segment passes, fabricated segment flags") {
    val df = (benfordRows ++ uniformRows).toDF("seg", "amount")
    val out = Benford.firstDigitAudit(df, "seg", col("seg"), col("amount"))
      .as[(String, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    val (_, nOk, chiOk, susOk) = out("ok")
    val (_, nFab, chiFab, susFab) = out("fab")
    assert(nOk == benfordRows.size && nFab == uniformRows.size)
    assert(!susOk && chiOk < 5.0) // rounding residue only
    assert(susFab && chiFab > Benford.CriticalChi2)
  }

  test("sub-1 amounts are excluded; absent digits still contribute") {
    // only digits 1 and 2 present -> digits 3..9 contribute their full
    // expected mass; the 0.5 rows never count
    val df = Seq(("g", 0.5), ("g", 1.0), ("g", 15.0), ("g", 2.5),
      ("g", 250.0)).toDF("seg", "amount")
    val Array((_, n, chi2, _)) = Benford.firstDigitAudit(
      df, "seg", col("seg"), col("amount"))
      .as[(String, Long, Double, Boolean)].collect()
    assert(n == 4) // 0.5 excluded
    // lower bound: the absent digits 3..9 alone contribute n*sum(e_d)
    val absentMass = (3 to 9).map(d => math.log10(1.0 + 1.0 / d)).sum * 4
    assert(chi2 > absentMass - 0.01)
  }

  test("first digit comes from the decimal string, not a double log") {
    // exact powers of ten are the classic float-log boundary bugs
    val df = Seq(("g", 10.0), ("g", 100.0), ("g", 1000.0), ("g", 999.99))
      .toDF("seg", "amount")
    val got = df.select(
      substring(floor(col("amount")).cast("long").cast("string"), 1, 1)
        .cast("int").as("d")).as[Int].collect().sorted
    assert(got.toSeq == Seq(1, 1, 1, 9))
  }
}
