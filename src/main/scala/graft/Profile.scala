package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time one registered query and optionally dump its plan.
  * Usage: runMain graft.Profile <sfDir> <queryName> [explain]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id) s").collect() // warmup
    if (args.contains("explain"))
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    (1 to 3).foreach { i =>
      // time construction + evaluation together, like Bench: several
      // operators do their real work EAGERLY at construction (persist/
      // localCheckpoint pipelines), so timing only the final write
      // would miss them entirely
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      // noop sink, matching Bench: count() would prune every projection
      df.write.format("noop").mode("overwrite").save()
      println(f"PROFILE $name run$i secs=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
