package graft
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the full query battery on SPARK_GRAFT_SF_DIR and
  * emits ONE JSON line. The line is printed to stdout AND written to the
  * file named by SPARK_GRAFT_BENCH_OUT (default ./bench_out.json) — sbt
  * prefixes stdout with [info], which breaks line-oriented parsers, so the
  * file is the canonical artifact.
  *
  * Interference-proofing (round-3 lesson: a host-load window inflated a
  * 0.64 s query to 19.8 s in the published bench because both passes ran
  * back-to-back inside the spike and the min survived). Methodology now
  * mirrors ScalingBench:
  *  - the battery runs as `passes` FULL interleaved sweeps (every query
  *    once per sweep, sweeps separated by a pause), so the per-query min
  *    spans different time windows instead of one contiguous block;
  *  - /proc/loadavg is sampled before and after every execution and the
  *    loads around each query's winning measurement are published in the
  *    JSON ("load" map) together with run-level loadavg_start/end, so a
  *    contaminated number is at least visibly contaminated;
  *  - after the sweeps, queries whose sweep times disagree by >1.4x (the
  *    signature of a spike hitting one sweep) are re-measured once more in
  *    a third, later time window and the min is kept ("n_remeasured").
  *
  * Failures are first-class: a query that throws is recorded under
  * "failed" with its error (never a fake tiny wall time), and the process
  * exits non-zero so a broken battery can't masquerade as a fast one.
  */
object Bench {

  private def loadAvg(): Double =
    try {
      val s = new String(Files.readAllBytes(Paths.get("/proc/loadavg")))
      s.split("\\s+")(0).toDouble
    } catch { case _: Throwable => 0.0 }

  /** One measurement: wall seconds plus the 1-min loadavg sampled
    * immediately before and after it. */
  private final case class Meas(sec: Double, loadBefore: Double, loadAfter: Double)

  /** The re-measure rule: sweep times for the SAME query on the same data
    * disagreeing by >1.4x is interference, not plan cost; sub-0.2 s
    * minima are exempt (scheduler noise dominates there and a third run
    * buys nothing). Unit-tested in BenchRuleSpec. */
  private[graft] def interferenceSuspect(secs: Seq[Double]): Boolean =
    secs.size > 1 && secs.min > 0.2 && secs.max > 1.4 * secs.min

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
    // pause between sweeps: long enough that a short load spike can't span
    // two sweeps of the same query, short enough not to dominate the run
    val sweepGapMs = sys.env.getOrElse("SPARK_GRAFT_BENCH_SWEEP_GAP_MS", "10000").toLong

    val loadStart = loadAvg()
    val meas = scala.collection.mutable.LinkedHashMap[String, scala.collection.mutable.ArrayBuffer[Meas]]()
    val failed = scala.collection.mutable.LinkedHashMap[String, String]()
    // SPARK_GRAFT_BENCH_FILTER: comma-separated substrings for local
    // iteration on a few queries; unset (the driver's mode) = full battery
    val nameFilter = sys.env.get("SPARK_GRAFT_BENCH_FILTER")
      .map(_.split(",").toSeq).getOrElse(Nil)
    val selected = SparkEntry.queries.filter { case (n, _) =>
      nameFilter.isEmpty || nameFilter.exists(n.contains)
    }

    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit = {
      val lb = loadAvg()
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        meas.getOrElseUpdate(name, scala.collection.mutable.ArrayBuffer.empty) +=
          Meas(sec, lb, loadAvg())
      } catch { case e: Throwable =>
        failed(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      }
    }

    // interleaved full sweeps: the min per query spans `passes` separate
    // time windows (the first sweep doubles as the per-query warmup — its
    // cold-cache cost is discarded by the min whenever a later sweep wins)
    (1 to passes).foreach { sweep =>
      if (sweep > 1) Thread.sleep(sweepGapMs)
      selected.foreach { case (name, fn) =>
        if (!failed.contains(name)) runOnce(name, fn)
      }
    }
    // targeted re-measure in a third time window: a >1.4x disagreement
    // between sweeps of the SAME query on the same data is interference,
    // not plan cost; tiny queries are exempt (sub-0.2 s ratios are noise)
    val suspects = selected.filter { case (name, _) =>
      !failed.contains(name) &&
        meas.get(name).exists(ts => interferenceSuspect(ts.toSeq.map(_.sec)))
    }
    if (suspects.nonEmpty) {
      Thread.sleep(sweepGapMs)
      suspects.foreach { case (name, fn) => runOnce(name, fn) }
    }

    // any failed pass disqualifies the query: a transient failure must not
    // contribute a (possibly warm-cache-only) min time, and n_ok +
    // n_failed must equal the query count
    failed.keys.foreach(meas.remove)
    val timed = meas.map { case (name, ts) => name -> ts.minBy(_.sec) }
    val loadEnd = loadAvg()

    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    val qs = timed.map { case (k, m) => jstr(k) + ":" + m.sec }.mkString("{", ",", "}")
    val ls = timed.map { case (k, m) =>
      jstr(k) + ":[" + m.loadBefore + "," + m.loadAfter + "]"
    }.mkString("{", ",", "}")
    val fs = failed.map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    val total = timed.values.map(_.sec).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""load":$ls,"loadavg_start":$loadStart,"loadavg_end":$loadEnd,""" +
        s""""sweeps":$passes,"n_remeasured":${suspects.size},""" +
        s""""failed":$fs,"n_ok":${timed.size},"n_failed":${failed.size},"sf":${jstr(sfDir)}}"""
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    Files.writeString(Paths.get(outPath), line + "\n")
    try spark.stop() catch { case _: Throwable => () }
    // printed AFTER stop so the JSON is the final stdout line (friendlier
    // to tail-parsing drivers; the file above stays the canonical artifact)
    println(line)
    if (failed.nonEmpty) sys.exit(1)
  }
}
