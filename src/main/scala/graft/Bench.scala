package graft
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the full query battery on SPARK_GRAFT_SF_DIR and
  * emits ONE JSON line. The line is printed to stdout AND written to the
  * file named by SPARK_GRAFT_BENCH_OUT (default ./bench_out.json) — sbt
  * prefixes stdout with [info], which breaks line-oriented parsers, so the
  * file is the canonical artifact.
  *
  * Failures are first-class: a query that throws is recorded under
  * "failed" with its error (never a fake tiny wall time), and the process
  * exits non-zero so a broken battery can't masquerade as a fast one.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb JVM/codegen/scan warmup so the first measured query isn't
    // charged for JIT + parquet footer caching
    spark.range(0, 1000000).selectExpr("sum(id)").collect()
    try spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).collect()
    catch { case _: Throwable => () }
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt

    val timed = scala.collection.mutable.LinkedHashMap[String, Double]()
    val failed = scala.collection.mutable.LinkedHashMap[String, String]()
    // SPARK_GRAFT_BENCH_FILTER: comma-separated substrings for local
    // iteration on a few queries; unset (the driver's mode) = full battery
    val nameFilter = sys.env.get("SPARK_GRAFT_BENCH_FILTER")
      .map(_.split(",").toSeq).getOrElse(Nil)
    val selected = SparkEntry.queries.filter { case (n, _) =>
      nameFilter.isEmpty || nameFilter.exists(n.contains)
    }
    selected.foreach { case (name, fn) =>
      // min over passes = steady-state (first pass may pay page-cache and
      // codegen-cache misses that say nothing about the plan's cost)
      val times = (1 to passes).flatMap { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          failed(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
          None
        }
      }
      // any failed pass disqualifies the query: a transient failure must not
      // contribute a (possibly warm-cache-only) min time, and n_ok +
      // n_failed must equal the query count
      if (times.nonEmpty && !failed.contains(name)) timed(name) = times.min
    }

    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    val qs = timed.map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    val fs = failed.map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    val total = timed.values.sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""failed":$fs,"n_ok":${timed.size},"n_failed":${failed.size},"sf":${jstr(sfDir)}}"""
    println(line)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    Files.writeString(Paths.get(outPath), line + "\n")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
