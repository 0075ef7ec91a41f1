package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import SaltedAgg._

/** Salting must be a pure physical rewrite: row-set equality with the plain
  * groupBy on skewed input, at any salt count, independent of parallelism. */
class SaltedAggSpec extends SparkSpec {

  // Zipf-ish skew: ~half the rows land on key 0
  private def skewed = spark.range(0, 5000)
    .withColumn("k", when(pmod(col("id"), lit(2)) === 0, 0L)
      .otherwise(pmod(xxhash64(col("id")), lit(37L))))
    .withColumn("v", (pmod(xxhash64(col("id") + 1), lit(1000L))).cast("double") / 10.0)

  private val specs = Seq(
    SSum("v", "sum_v"), SCount("n"), SMin("v", "min_v"),
    SMax("v", "max_v"), SAvg("v", "avg_v"))

  test("saltedAgg == plain groupBy on skewed keys") {
    val plain = skewed.groupBy("k").agg(
      sum(col("v")).as("sum_v"), count(lit(1)).as("n"),
      min(col("v")).as("min_v"), max(col("v")).as("max_v"),
      avg(col("v")).as("avg_v"))
    val salted = SaltedAgg.saltedAgg(skewed, Seq("k"), Seq("id"), 8, specs)
    assertSameRows(salted, plain)
  }

  test("salt count and partitioning do not change results") {
    val a = SaltedAgg.saltedAgg(skewed.repartition(2), Seq("k"), Seq("id"), 4, specs)
    val b = SaltedAgg.saltedAgg(skewed.repartition(13), Seq("k"), Seq("id"), 32, specs)
    assertSameRows(a, b)
  }
}
