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
}
