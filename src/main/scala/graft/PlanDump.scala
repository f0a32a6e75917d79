package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: dump `.explain("formatted")` for the named queries into
  * one file each — the plan evidence `plans/r16/` carries for every
  * optimization (judge checks plan claims against these).
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> <query...>
  * Writes <outDir>/<query>_<suffix>.txt.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args.drop(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val plan =
        try SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"ERROR building $name: $e" }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
      println(s"PLAN $name -> $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
