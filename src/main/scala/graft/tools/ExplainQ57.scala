package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan audit for the ANN queries (exchange/scan census). */
object ExplainQ57 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = args.headOption.getOrElse("q104_lsh_ranking")
    val df = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    println("SHUFFLES=" + "Exchange hashpartitioning".r.findAllIn(plan).length)
    println("BROADCASTS=" + "BroadcastExchange".r.findAllIn(plan).length)
    println("SCANS=" + "FileScan".r.findAllIn(plan).length)
    println("REUSED=" + "ReusedExchange".r.findAllIn(plan).length)
    spark.stop()
  }
}
