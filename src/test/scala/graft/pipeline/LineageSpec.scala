package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class LineageSpec extends SparkSpec {
  import spark.implicits._

  private def mkInput(n: Long) = spark.range(0, n)
    .withColumn("entity", pmod(col("id"), lit(8)))
    .withColumn("window_start", expr("timestampadd(MINUTE, CAST(id AS INT), timestamp'2024-01-01')"))
    .withColumn("v", col("id").cast("double"))

  test("lineage rows: counts, ts bounds, digest independent of partitioning") {
    val df = mkInput(100)
    val a = Lineage.compute(df.repartition(1), "entity", "window_start", 4)
    val b = Lineage.compute(df.repartition(7), "entity", "window_start", 4)
    assertSameRows(a, b)
    val total = a.agg(sum("row_count")).collect()(0).getLong(0)
    assert(total === 100L)
  }

  test("digest detects content changes") {
    val d1 = Lineage.compute(mkInput(100), "entity", "window_start", 1)
      .select("digest").collect()(0).getLong(0)
    val d2 = Lineage.compute(mkInput(100).withColumn("v", col("v") + 1), "entity", "window_start", 1)
      .select("digest").collect()(0).getLong(0)
    assert(d1 !== d2)
  }

  test("resume skips completed buckets and converges to the full output") {
    val tmp = Files.createTempDirectory("graft-lineage").toString
    val outDir = s"$tmp/out"; val linDir = s"$tmp/lineage"
    val full = mkInput(200)
    // run 1: a bucket-aligned subset completes before the "kill" — lineage
    // marks exactly those buckets done
    val part1 = full.where(Lineage.bucketOf("entity", 8) < 4)
    Lineage.runResumable(spark, part1, "entity", "window_start", 8, outDir, linDir)(identity)
    val lineageAfter1 = spark.read.parquet(linDir).count()
    assert(lineageAfter1 > 0)

    // run 2: full input; completed buckets must be skipped (appended rows
    // correspond only to entities not covered by run 1's lineage)
    val out2 = Lineage.runResumable(spark, full, "entity", "window_start", 8, outDir, linDir)(identity)
    // no duplicates: every id appears exactly once in the final output
    val dupes = out2.groupBy("id").count().where(col("count") > 1).count()
    assert(dupes === 0L)
    assert(out2.count() === 200L)

    // per-run metrics: one row per run; run 2's skipped count = run 1's
    // completed count, and rows_written across runs sums to the output
    val metrics = spark.read.parquet(s"${linDir}_metrics")
      .orderBy("run_at_ms")
      .select("buckets_completed", "buckets_skipped", "rows_written")
      .collect()
    assert(metrics.length === 2)
    assert(metrics(0).getLong(0) === lineageAfter1)
    assert(metrics(0).getLong(1) === 0L)
    assert(metrics(1).getLong(1) === lineageAfter1)
    assert(metrics.map(_.getLong(2)).sum === 200L)
  }
}
