package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg: comma-separated query names — iterate on one
    // query without paying the full 70-query battery
    val only: Set[String] =
      if (args.length > 2) args(2).split(",").map(_.trim).toSet else Set.empty
    def selected(name: String): Boolean = only.isEmpty || only(name)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    // Materialize the flagship pipeline's deterministic synthesized inputs
    // so the DuckDB oracle can replay the exact table the pipeline shuffles:
    // the prepared-slim stream (everything below the prepare cut already
    // applied) and the label table, timestamps as epoch seconds (the
    // synthesis is whole-second; avoids parquet timestamp-annotation skew).
    val synthDir = java.nio.file.Paths.get(outDir).toAbsolutePath.toString + "/__synth"
    import org.apache.spark.sql.functions.{col, unix_timestamp}
    val selOracles = SparkEntry.oracleSql.filter { case (k, _) => selected(k) }
    if (selOracles.exists(_._2.contains("__SYNTH_DIR__/flagship"))) {
      pipeline.FeaturePipeline.preparedSynthetic(spark, 20000, 64)
        .withColumn("ts_sec", unix_timestamp(col("ts"))).drop("ts")
        .coalesce(1).write.mode("overwrite").parquet(s"$synthDir/flagship_prepared")
      sources.SynthImages.labels(spark, 20000, 64)
        .withColumn("label_ts_sec", unix_timestamp(col("label_ts"))).drop("label_ts")
        .coalesce(1).write.mode("overwrite").parquet(s"$synthDir/flagship_labels")
    }
    // the raw image table (bytes payloads included) for the image-fidelity
    // oracle: DuckDB re-parses the SAME parquet blobs via hex slicing
    if (selOracles.exists(_._2.contains("__SYNTH_DIR__/images"))) {
      sources.SynthImages.images(spark, 20000, 64).drop("ts")
        .coalesce(1).write.mode("overwrite").parquet(s"$synthDir/images")
    }
    // the raw audio clip table for the audio-features oracle, same pattern
    if (selOracles.exists(_._2.contains("__SYNTH_DIR__/audio"))) {
      sources.SynthAudio.clips(spark, 12000, 64).drop("ts")
        .coalesce(1).write.mode("overwrite").parquet(s"$synthDir/audio")
    }
    // the raw video container table for the frame-sample oracle
    if (selOracles.exists(_._2.contains("__SYNTH_DIR__/video"))) {
      sources.SynthVideo.clips(spark, 3000, 64).drop("ts")
        .coalesce(1).write.mode("overwrite").parquet(s"$synthDir/video")
    }

    SparkEntry.queries.foreach { case (name, fn) =>
      if (selected(name)) {
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => selected(k) }
      .map { case (k, v) =>
        s"${q(k)}: ${q(v.replace("__SYNTH_DIR__", synthDir))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
