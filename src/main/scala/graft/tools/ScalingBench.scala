package graft.tools

import org.apache.spark.sql.SparkSession

/** Two-parallelism scaling evidence for the north rule's N -> 4N criterion
  * (no real cluster in the sandbox, per BASELINE.md's measurement plan):
  * run the IDENTICAL flagship job at local[N] and local[4N] on the same
  * deterministic input and report rows/sec at both plus
  * efficiency = throughput_4N / (4 * throughput_N).
  *
  * Emits one JSON line:
  * {"metric":"scaling_efficiency","value":E,"unit":"ratio",
  *  "rows":R,"n_cores":N,"rows_per_sec_n":…,"rows_per_sec_4n":…,…}
  */
object ScalingBench {

  def main(args: Array[String]): Unit = {
    val nRows = sys.env.getOrElse("SPARK_GRAFT_SCALE_ROWS", "400000").toLong
    val nEntities = 256
    val nCores = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "8").toInt
    val warmup = sys.env.getOrElse("SPARK_GRAFT_SCALE_WARMUP", "1").toInt

    def runAt(cores: Int): (Double, Long) = {
      val spark = SparkSession.builder()
        .master(s"local[$cores]")
        .appName(s"graft-scaling-$cores")
        .config("spark.sql.shuffle.partitions", cores.toString)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      try {
        var rows = 0L
        // warm-up pass populates code cache / JIT so the measured pass
        // reflects steady-state throughput at both levels equally
        (0 until warmup).foreach { _ =>
          graft.pipeline.FeaturePipeline.runSynthetic(spark, nRows / 4, nEntities).count()
        }
        val t0 = System.nanoTime()
        rows = graft.pipeline.FeaturePipeline
          .runSynthetic(spark, nRows, nEntities).count()
        val secs = (System.nanoTime() - t0) / 1e9
        (secs, rows)
      } finally spark.stop()
    }

    val (tN, outN) = runAt(nCores)
    val (t4N, out4N) = runAt(4 * nCores)
    require(outN == out4N, s"non-deterministic output: $outN vs $out4N")

    val thrN = nRows / tN
    val thr4N = nRows / t4N
    val eff = thr4N / (4.0 * thrN)
    println(
      s"""{"metric":"scaling_efficiency","value":$eff,"unit":"ratio","rows":$nRows,""" +
      s""""feature_rows":$outN,"n_cores":$nCores,""" +
      s""""sec_n":$tN,"sec_4n":$t4N,""" +
      s""""rows_per_sec_n":$thrN,"rows_per_sec_4n":$thr4N}""")
  }
}
