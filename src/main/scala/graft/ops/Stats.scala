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

  /** Trimmed mean/std with `frac` cut from each tail, scipy semantics:
    * drop exactly floor(frac*n) lowest and floor(frac*n) highest values
    * (by sorted position, ties broken by `tieBreak` for determinism).
    * Reference: `melody/handler.py:172-194` (limits=(0.1,0.1)).
    *
    * One window pass (rank + group count) + filtered hash aggregate:
    * shuffle by group keys once; the sort is within partitions.
    */
  def trimmedStats(df: DataFrame, groupCols: Seq[String], valueCol: String,
                   frac: Double, tieBreak: Seq[String]): DataFrame = {
    val wOrd = Window.partitionBy(groupCols.map(col): _*)
      .orderBy((col(valueCol) +: tieBreak.map(col)): _*)
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    val ranked = df
      .withColumn("__rn", row_number().over(wOrd))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__mean_all", avg(col(valueCol)).over(wAll))
      .withColumn("__k", floor(col("__n") * frac))
    ranked
      .where(col("__rn") > col("__k") && col("__rn") <= col("__n") - col("__k"))
      .groupBy(groupCols.map(col): _*)
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
