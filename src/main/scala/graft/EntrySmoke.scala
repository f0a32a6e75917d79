package graft
import org.apache.spark.sql.SparkSession

/** Replica of the driver's smoke check: call SparkEntry.entry on a
  * plain default session (no graft-specific confs — entry must set
  * anything it needs at runtime) and require rows > 0.
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(s)
    println(s"ENTRY_ROWS=${df.count()} COLS=${df.columns.sorted.mkString(",")}")
    s.stop()
  }
}
