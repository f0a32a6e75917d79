package graft.maintenance

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class CompactionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def parquetFiles(path: String): Seq[String] =
    new java.io.File(path).listFiles().toSeq.map(_.getName)
      .filter(_.endsWith(".parquet"))

  test("compact merges a many-small-file table, preserving every row") {
    val dir = java.nio.file.Files.createTempDirectory("cmpct").toString
    val path = s"$dir/t"
    (1L to 5000L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(40).write.parquet(path)
    assert(parquetFiles(path).size == 40)
    val before = spark.read.parquet(path)
      .as[(Long, String)].collect().toSet
    // target sized so the ~tens-of-KB table lands in ONE file
    val n = Compaction.compact(spark, path, targetFileBytes = 512L << 20)
    assert(n == 1 && parquetFiles(path).size == 1)
    val after = spark.read.parquet(path).as[(Long, String)].collect().toSet
    assert(after == before)
    // idempotent: already compacted -> no rewrite, same count back
    val mtime = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.lastModified).toSeq
    assert(Compaction.compact(spark, path, 512L << 20) == 1)
    assert(new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(_.lastModified).toSeq == mtime)
  }

  test("compact splits to the byte-derived file count, not always 1") {
    val dir = java.nio.file.Files.createTempDirectory("cmpct2").toString
    val path = s"$dir/t"
    (1L to 20000L).map(i => (i, ("x" * 100) + i)).toDF("k", "v")
      .repartition(64).write.parquet(path)
    val bytes = Compaction.dataBytes(spark, path)
    val target = bytes / 3 // force ~4 output files (ceil division)
    val n = Compaction.compact(spark, path, target)
    assert(n == ((bytes + target - 1) / target).toInt)
    assert(parquetFiles(path).size == n && n > 1 && n < 64)
    assert(spark.read.parquet(path).count() == 20000L)
  }
}
