package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bias-corrected moments must equal scipy(bias=False)/DuckDB; constants
  * below were produced by DuckDB 1.x skewness/kurtosis on the same values. */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("skewnessCorrected / kurtosisCorrected match DuckDB on [1,2,3,4,10]") {
    val df = Seq(1.0, 2.0, 3.0, 4.0, 10.0).toDF("x")
    val r = df.agg(
      Stats.skewnessCorrected(col("x")).as("sk"),
      Stats.kurtosisCorrected(col("x")).as("ku"),
      stddev_samp(col("x")).as("sd")).collect()(0)
    assert(math.abs(r.getDouble(0) - 1.6970562748477143) < 1e-9)
    assert(math.abs(r.getDouble(1) - 3.151999999999994) < 1e-9)
    assert(math.abs(r.getDouble(2) - 3.5355339059327378) < 1e-9)
  }

  test("corrected moments are numerically STABLE at extreme mean/sigma ratio") {
    // 127 +- ~0.003: a raw-power-sum kurtosis loses every significant digit
    // here (DuckDB's built-in returns ~2e5 on such data; truth is O(1)) —
    // Spark's streaming central-moment aggregates must stay within 1e-9 of
    // the float128-exact values. This is the regime flagship brightness
    // windows actually hit (means ~1e2, window sigma down to ~2e-3), and
    // the reason the q55/q65 oracles mirror skew/kurt with a two-pass
    // centered computation instead of DuckDB's aggregate.
    val offs = Seq(1, -3, 2, 5, -4, 0, 3, -2, -5, 4).map(_ * 0.001)
    val df = offs.map(127.0 + _).toDF("x")
    val r = df.agg(
      Stats.skewnessCorrected(col("x")).as("sk"),
      Stats.kurtosisCorrected(col("x")).as("ku"),
      stddev_samp(col("x")).as("sd")).collect()(0)
    assert(math.abs(r.getDouble(0) - -0.10453810446837923) < 1e-9, s"skew ${r.getDouble(0)}")
    assert(math.abs(r.getDouble(1) - -1.412829594647779) < 1e-9, s"kurt ${r.getDouble(1)}")
    assert(math.abs(r.getDouble(2) - 0.003478505426185218) < 1e-12, s"std ${r.getDouble(2)}")
  }

  test("moments are null below their domain (n<3 skew, n<4 kurt)") {
    val r = Seq(1.0, 2.0).toDF("x").agg(
      Stats.skewnessCorrected(col("x")).as("sk"),
      Stats.kurtosisCorrected(col("x")).as("ku")).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
    val r3 = Seq(1.0, 2.0, 4.0).toDF("x")
      .agg(Stats.kurtosisCorrected(col("x"))).collect()(0)
    assert(r3.isNullAt(0))
  }

  test("safeDiv: x/0 -> 0 (musif convention), null den -> 0") {
    val df = Seq((1.0, 2.0), (5.0, 0.0)).toDF("n", "d")
    val got = df.select(Stats.safeDiv(col("n"), col("d"))).collect().map(_.getDouble(0)).toSeq
    assert(got === Seq(0.5, 0.0))
  }

  test("textureRatio: x/0 -> inf, 0/0 -> NaN (texture module convention)") {
    val df = Seq((6L, 3L), (5L, 0L), (0L, 0L)).toDF("n", "d")
    val got = df.select(Stats.textureRatio(col("n"), col("d"))).collect().map(_.getDouble(0))
    assert(got(0) === 2.0)
    assert(got(1).isPosInfinity)
    assert(got(2).isNaN)
  }

  test("trimmedStats: scipy semantics, floor(0.1 n) per tail") {
    // n=12 -> k=1: drop min and max exactly once
    val df = Seq(5, 1, 9, 3, 7, 11, 2, 8, 4, 10, 6, 12)
      .map(v => (1L, v.toLong, v.toDouble)).toDF("g", "id", "x")
    val r = Stats.trimmedStats(df, Seq("g"), "x", 0.1, Seq("id")).collect()(0)
    assert(math.abs(r.getAs[Double]("trimmed_mean") - 6.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("trimmed_std") - 3.0276503540974917) < 1e-12)
    assert(r.getAs[Long]("trimmed_n") === 10L)
  }

  test("trimmedStats: n<10 trims nothing (floor(0.1 n)=0)") {
    val df = Seq(1, 2, 9).map(v => (1L, v.toLong, v.toDouble)).toDF("g", "id", "x")
    val r = Stats.trimmedStats(df, Seq("g"), "x", 0.1, Seq("id")).collect()(0)
    assert(r.getAs[Long]("trimmed_n") === 3L)
    assert(math.abs(r.getAs[Double]("trimmed_mean") - 4.0) < 1e-12)
  }

  /** The straightforward single-window formulation (the pre-two-phase
    * implementation) — kept as the randomized-parity reference. */
  private def windowedTrimmed(df: org.apache.spark.sql.DataFrame,
                              groupCols: Seq[String], valueCol: String,
                              frac: Double, tieBreak: Seq[String]) = {
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy(groupCols.map(col): _*)
      .orderBy((col(valueCol) +: tieBreak.map(col)): _*)
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    df.withColumn("__rn", row_number().over(wOrd))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__mean_all", avg(col(valueCol)).over(wAll))
      .withColumn("__k", floor(col("__n") * frac))
      .where(col("__rn") > col("__k") && col("__rn") <= col("__n") - col("__k"))
      .groupBy(groupCols.map(col): _*)
      .agg(
        avg(col(valueCol)).as("trimmed_mean"),
        stddev_samp(col(valueCol)).as("trimmed_std"),
        count(lit(1)).as("trimmed_n"),
        first(col("__mean_all")).as("__untrimmed_mean"))
      .withColumn("trim_diff", col("__untrimmed_mean") - col("trimmed_mean"))
      .withColumn("trim_ratio",
        when(col("__untrimmed_mean") =!= 0.0,
          (col("__untrimmed_mean") - col("trimmed_mean")) / col("__untrimmed_mean"))
          .otherwise(lit(0.0)))
      .drop("__untrimmed_mean")
  }

  test("trimmedStats two-phase == single-window formulation (randomized, heavy ties)") {
    val rnd = new scala.util.Random(11)
    // tiny value domain -> ties everywhere, including across approx-quantile
    // boundaries; 3 uneven groups; some groups below the trim threshold
    val rows = (1L to 4000L).map { i =>
      (rnd.nextInt(3).toLong, i, rnd.nextInt(12).toDouble)
    } ++ Seq((9L, 900001L, 5.0), (9L, 900002L, 7.0)) // n=2 group
    val df = rows.toDF("g", "id", "x")
    assertSameRows(
      Stats.trimmedStats(df, Seq("g"), "x", 0.1, Seq("id")),
      windowedTrimmed(df, Seq("g"), "x", 0.1, Seq("id")))
    // a different bucket count must not change the result (exact ranks)
    assertSameRows(
      Stats.trimmedStats(df, Seq("g"), "x", 0.1, Seq("id"), rangeBuckets = 5),
      windowedTrimmed(df, Seq("g"), "x", 0.1, Seq("id")))
  }

  test("trimmedStats: no single-task per-group sort (rank window is bucketed)") {
    val df = (1L to 1000L).map(i => (1L, i, (i % 97).toDouble)).toDF("g", "id", "x")
    val plan = Stats.trimmedStats(df, Seq("g"), "x", 0.1, Seq("id"))
      .queryExecution.executedPlan.toString
    // the full-data row_number window must partition by (group, __bkt), so a
    // single group spreads over rangeBuckets tasks instead of one; plan text:
    //   Window [row_number() windowspecdefinition(g#.., __bkt#.., ...)
    val rankWindows = "Window \\[row_number\\(\\) windowspecdefinition\\(([^)]*)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(rankWindows.nonEmpty && rankWindows.forall(_.contains("__bkt")),
      s"rank window not bucketed:\n$plan")
  }
}
