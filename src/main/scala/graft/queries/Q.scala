package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the driver-facing query battery.
  *
  * Oracle-parity conventions (Spark vs DuckDB on identical parquet):
  *  - every aggregate/computed column is aliased identically on both sides;
  *  - double aggregates are rounded (6 dp for stats, 2 dp for large sums) to
  *    absorb summation-order differences;
  *  - counts are cast to BIGINT on both sides (DuckDB sum(int) is HUGEINT);
  *  - seconds come from Spark `unix_timestamp` == DuckDB
  *    `date_diff('second', TIMESTAMP '1970-01-01', ts)` (both floor).
  */
object Q {
  type QueryFn = (SparkSession, String) => DataFrame

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Rounding with a tie-breaking epsilon: Spark rounds doubles via exact
    * BigDecimal HALF_UP while DuckDB multiplies by 10^d in double space, so
    * values that are EXACT decimal ties (e.g. avg = 44.7590625) round
    * differently. The epsilon (applied identically in the oracle SQL) moves
    * data-produced ties off the boundary; engine-level value differences are
    * ~1e-12 so the shifted boundary is still safe. */
  final val TieEps = graft.ops.Stats.TieEps
  def r6(c: Column): Column = round(c + lit(TieEps), 6)
  def r4(c: Column): Column = round(c + lit(TieEps), 4)
  def r2(c: Column): Column = round(c + lit(TieEps), 2)

  /** DuckDB-side epoch-seconds (floored), matching Spark unix_timestamp. */
  def sqlEpoch(col: String): String =
    s"date_diff('second', TIMESTAMP '1970-01-01', $col)"

  /** DuckDB-side normalized text, matching graft.functions.Text.normText. */
  def sqlNorm(col: String): String =
    s"regexp_replace(lower(trim($col)), '\\s+', ' ', 'g')"

  /** Build-once cache under a deterministic temp path: when
    * `<root>/<marker>` is absent, wipe any leftovers and run `build`, then
    * create the marker. Repeated Verify/Bench invocations then measure
    * READS of the cached layout, not rebuilds; a missing marker with
    * leftovers present means a previous build crashed mid-commit — wipe
    * and rebuild rather than stacking duplicate commits on a half-built
    * snapshot log. Returns `root`. */
  def cachedBuild(root: String, marker: String = "__layout_complete")
                 (build: => Unit): String = {
    import java.nio.file.{Files, Paths}
    val done = Paths.get(root, marker)
    if (!Files.exists(done)) {
      val rootP = Paths.get(root)
      if (Files.isDirectory(rootP)) {
        val walk = Files.walk(rootP)
        try {
          import scala.jdk.CollectionConverters._
          walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
        } finally walk.close()
      }
      build
      Files.createDirectories(done.getParent)
      Files.createFile(done)
    }
    root
  }
}
