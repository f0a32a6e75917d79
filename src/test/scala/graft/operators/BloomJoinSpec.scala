package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class BloomJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("zero false negatives: every member passes the prefilter") {
    val members = (0L until 500L).map(_ * 7L).toDF("id")
    val bits = BloomJoin.build(members, col("id"), m = 4096, k = 3, seed = 2L)
    val kept = members
      .filter(BloomJoin.mightContain(col("id"), bits, k = 3, seed = 2L))
      .count()
    assert(kept == 500L) // a Bloom filter may over-admit, never drop
  }

  test("filter state is bounded at m bits and matches a driver replay") {
    val members = (0L until 200L).toDF("id")
    val bits = BloomJoin.build(members, col("id"), m = 1024, k = 3, seed = 0L)
    assert(bits.length == 1024)
    def h(id: Long, probe: Int): Int =
      ((id % Sample.Prime) * (Sample.Mult + probe) %
        Sample.Prime2 * Sample.Mult2 % 1024L).toInt
    val want = (0L until 200L).flatMap(id => (0 to 2).map(h(id, _))).toSet
    assert(bits.zipWithIndex.collect { case (true, i) => i }.toSet == want)
  }

  test("prefilter + exact join == exact join alone; FP mass is the bit-budget trade") {
    val members = (0L until 300L).filter(_ % 3 == 0).toDF("id")
    val probe = (0L until 3000L).toDF("id")
    // deliberately tight: 100 keys * 3 probes into 256 bits -> real FPs
    val bits = BloomJoin.build(members, col("id"), m = 256, k = 3, seed = 1L)
    val pre = probe.filter(BloomJoin.mightContain(col("id"), bits,
      k = 3, seed = 1L))
    val viaBloom = pre.join(members, Seq("id"), "left_semi")
      .as[Long].collect().toSet
    val direct = probe.join(members, Seq("id"), "left_semi")
      .as[Long].collect().toSet
    assert(viaBloom == direct) // semantics preserved end-to-end
    val fp = pre.count() - direct.size
    assert(fp > 0) // the tight budget really produced false positives
  }
}
