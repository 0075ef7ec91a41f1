package graft.tools

import org.apache.spark.sql.SparkSession

/** Smoke the driver contract exactly as the driver does: SparkEntry.entry
  * rows > 0 plus schema echo. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    println(s"[entry-smoke] rows=$n cols=${df.columns.length}")
    df.show(5, truncate = false)
    spark.stop()
  }
}
