package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical aggregates matching the reference's conventions exactly:
  * sample stddev, bias-corrected (Fisher) skewness/kurtosis, scipy-style
  * trimmed stats, and the `x/0 -> 0` zero-guard.
  *
  * Spark's built-in `skewness`/`kurtosis` are the *population* (biased)
  * estimators g1/g2; musif uses scipy with `bias=False`
  * (`/root/reference/musif/extract/features/melody/handler.py:577-607`),
  * i.e. the corrected G1/G2 — also what DuckDB's skewness/kurtosis compute.
  * We correct by expression composition over the built-ins, which keeps the
  * whole aggregation inside hash-agg + whole-stage codegen (no UDAF object
  * churn, partial aggregation still applies).
  */
object Stats {

  /** THE cross-engine tie-breaking rounding epsilon — single source of
    * truth referenced by `queries.Q.TieEps` and every op that pre-rounds a
    * ratio for oracle comparability (see Q's scaladoc for the calibration
    * rationale). */
  final val TieEps = 3.7e-10

  /** A plan that is just scan + narrow per-row work (filter/project):
    * consuming it twice costs one extra columnar read, not a recompute of
    * anything expensive — the [[trimmedStats]] staging threshold. */
  private def isScanShaped(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Generate, Join, Sort, Union, Window => LWindow}
    !df.queryExecution.analyzed.exists {
      case _: Join | _: Aggregate | _: LWindow | _: Generate | _: Sort | _: Union => true
      case _ => false
    }
  }

  /** Bias-corrected sample skewness G1 = g1 * sqrt(n(n-1)) / (n-2).
    * Null when n < 3 (matching scipy/DuckDB domain). */
  def skewnessCorrected(c: Column): Column = {
    val n = count(c).cast("double")
    when(n >= 3, skewness(c) * sqrt(n * (n - 1)) / (n - 2))
  }

  /** Bias-corrected excess kurtosis
    * G2 = ((n+1)*g2 + 6) * (n-1) / ((n-2)(n-3)). Null when n < 4. */
  def kurtosisCorrected(c: Column): Column = {
    val n = count(c).cast("double")
    when(n >= 4, ((n + 1) * kurtosis(c) + 6) * (n - 1) / ((n - 2) * (n - 3)))
  }

  /** musif's division convention: x/0 -> 0 (not null/inf). Reference:
    * `melody/handler.py:195-212`. */
  def safeDiv(num: Column, den: Column): Column =
    when(den =!= 0 && den.isNotNull, num / den).otherwise(lit(0.0))

  /** The texture module's OTHER division convention — x/0 -> +inf,
    * 0/0 -> NaN (`/root/reference/musif/extract/features/texture/
    * handler.py:83-89`, np.inf / np.nan). Distinct from [[safeDiv]];
    * q68 never triggers the zero branch on real data (a part with zero
    * notes is absent from the counts table), so the convention is
    * spec-verified rather than oracled. */
  def textureRatio(num: Column, den: Column): Column =
    when(den === 0,
      when(num > 0, lit(Double.PositiveInfinity)).otherwise(lit(Double.NaN)))
      .otherwise(num.cast("double") / den)

  /** Trimmed mean/std with `frac` cut from each tail, scipy semantics:
    * drop exactly floor(frac*n) lowest and floor(frac*n) highest values
    * (by sorted position, ties broken by `tieBreak` for determinism).
    * Reference: `melody/handler.py:172-194` (limits=(0.1,0.1)).
    *
    * Scale shape — two-phase exact ranking instead of a per-group windowed
    * sort (which serializes a whole group into ONE task when the group key
    * has few distinct values — a straggler at 100x):
    *   1. one hash-aggregate pass per group: n, untrimmed mean, min/max
    *      (broadcast back);
    *   2. each row gets a uniform [min, max) range-bucket (pure arithmetic
    *      — equal values always share a bucket, so bucket order respects
    *      the total (value, tieBreak) order), a tiny per-(group, bucket)
    *      count table yields exclusive prefix offsets, and the global rank
    *      is offset + row_number within (group, bucket) — per-task sort
    *      size drops from |group| to ~|group|/rangeBuckets.
    * The ranks are EXACT regardless of how lopsided the range split is
    * (bucketing only affects load balance, never order — a degenerate
    * all-one-value group just falls back to a single-bucket sort for that
    * group), so the scipy positional-trim semantics are preserved
    * bit-for-bit. Costs two extra bounded scans vs the windowed sort; at
    * scale that trade removes an unbounded single-task straggler.
    *
    * The per-group stats/offsets tables (|groups| * rangeBuckets rows) are
    * broadcast — this path targets the low-cardinality-group regime where
    * the windowed sort stragglers; at high group cardinality the groups
    * spread across tasks anyway and either formulation balances.
    */
  def trimmedStats(df0: DataFrame, groupCols: Seq[String], valueCol: String,
                   frac: Double, tieBreak: Seq[String],
                   rangeBuckets: Int = 32): DataFrame = {
    require(rangeBuckets >= 1, s"rangeBuckets must be >= 1: $rangeBuckets")
    val gc = groupCols.map(col)

    // The input feeds TWO subtrees below (the per-group stats aggregate and
    // the bucketed rank pass). On a raw table Catalyst's scan/exchange reuse
    // makes that cheap, but a DERIVED input (shuffle -> lag window ->
    // explode, q79) would re-execute its whole upstream chain once per
    // subtree — a constant-factor ~2x that survives to any scale. Stage
    // such inputs once (MEMORY_AND_DISK: spills, never OOMs); trivial
    // scan-shaped plans skip the cache so the pushdown-friendly single-scan
    // path is untouched. The cache lives until LRU eviction — bounded by
    // the caller's (group, value, tieBreak) projection.
    val df =
      if (df0.storageLevel != org.apache.spark.storage.StorageLevel.NONE) df0
      else if (isScanShaped(df0)) df0
      else df0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // phase 1: per-group size, untrimmed mean, value range (cheap codegen'd
    // aggregates — a quantile sketch would balance better but costs more
    // than the sort it saves at moderate SF; balance is best-effort anyway)
    val gstats = df.groupBy(gc: _*).agg(
      count(lit(1)).as("__n"),
      avg(col(valueCol)).as("__mean_all"),
      min(col(valueCol)).as("__vmin"),
      max(col(valueCol)).as("__vmax"))

    // phase 2a: uniform range-bucket per row; NULL values (and all-NULL or
    // constant groups) land in bucket 0, matching the NULLS FIRST ascending
    // rank of a plain window
    val v = col(valueCol).cast("double")
    val width = (col("__vmax").cast("double") - col("__vmin").cast("double")) /
      rangeBuckets
    val bucketed = df.join(broadcast(gstats), groupCols)
      .withColumn("__bkt",
        coalesce(
          when(col("__vmax") > col("__vmin"),
            least(lit(rangeBuckets - 1),
              greatest(lit(0),
                floor((v - col("__vmin").cast("double")) / width).cast("int")))),
          lit(0)))
      .drop("__vmin", "__vmax") // prune before the (group, bucket) exchange

    // phase 2b: exclusive prefix counts per (group, bucket) — tiny table
    val bucketCounts = bucketed.groupBy((gc :+ col("__bkt")): _*)
      .agg(count(lit(1)).as("__bc"))
    val wCum = Window.partitionBy(gc: _*).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketCounts
      .withColumn("__offset", coalesce(sum(col("__bc")).over(wCum), lit(0L)))
      .drop("__bc")

    // phase 2c: global rank = prefix offset + within-bucket row_number;
    // the one full-data exchange is by (group, bucket) — balanced
    val wOrd = Window.partitionBy((gc :+ col("__bkt")): _*)
      .orderBy((col(valueCol) +: tieBreak.map(col)): _*)
    val ranked = bucketed.join(broadcast(offsets), groupCols :+ "__bkt")
      .withColumn("__rn", row_number().over(wOrd).cast("long") + col("__offset"))
      .withColumn("__k", floor(col("__n") * frac))

    ranked
      .where(col("__rn") > col("__k") && col("__rn") <= col("__n") - col("__k"))
      .groupBy(gc: _*)
      .agg(
        avg(col(valueCol)).as("trimmed_mean"),
        stddev_samp(col(valueCol)).as("trimmed_std"),
        count(lit(1)).as("trimmed_n"),
        // constant within the group — first() just carries it through
        first(col("__mean_all")).as("__untrimmed_mean"))
      // TrimDiff / TrimRatio (`melody/handler.py:187-194`): how much the
      // tails moved the mean, absolute and relative (x/0 -> 0 convention)
      .withColumn("trim_diff", col("__untrimmed_mean") - col("trimmed_mean"))
      .withColumn("trim_ratio",
        when(col("__untrimmed_mean") =!= 0.0,
          (col("__untrimmed_mean") - col("trimmed_mean")) / col("__untrimmed_mean"))
          .otherwise(lit(0.0)))
      .drop("__untrimmed_mean")
  }
}
