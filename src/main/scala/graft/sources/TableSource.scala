package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Input-table resolution for the job entry points. The engine is
  * source-agnostic DataFrame-in/DataFrame-out; this maps a spec string to a
  * source:
  *
  *  - `table:<catalog.db.tbl>` — catalog table (the production path: with an
  *    Iceberg catalog configured on the session, `spark.read.table` gets
  *    snapshot isolation, partition pruning and min/max file skipping; no
  *    Iceberg jars ship in this sandbox, so this path is exercised only via
  *    the session catalog);
  *  - `synth:<n>` — deterministic synthesis at n rows (tests/benchmarks);
  *  - anything else — a parquet directory.
  *
  * Snapshot pinning for resumable runs: pass
  * `option:<k>=<v>;...;table:<tbl>` to forward reader options (e.g.
  * Iceberg's `snapshot-id`) so a resumed job reads the SAME snapshot its
  * lineage table was computed against.
  */
object TableSource {

  def load(spark: SparkSession, spec: String,
           synth: (SparkSession, Long) => DataFrame): DataFrame = {
    val (opts, rest) = parseOptions(spec)
    val reader = opts.foldLeft(spark.read) { case (r, (k, v)) => r.option(k, v) }
    rest match {
      case s if s.startsWith("table:") => reader.table(s.stripPrefix("table:"))
      case s if s.startsWith("synth:") => synth(spark, s.stripPrefix("synth:").toLong)
      case dir => reader.parquet(dir)
    }
  }

  private def parseOptions(spec: String): (Seq[(String, String)], String) = {
    val parts = spec.split(";")
    val opts = parts.takeWhile(_.startsWith("option:")).toSeq.map { p =>
      val kv = p.stripPrefix("option:")
      val i = kv.indexOf('=')
      require(i > 0, s"malformed option in source spec: $p")
      kv.substring(0, i) -> kv.substring(i + 1)
    }
    (opts, parts.drop(opts.length).mkString(";"))
  }
}
