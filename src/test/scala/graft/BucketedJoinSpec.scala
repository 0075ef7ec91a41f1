package graft

import org.apache.spark.sql.functions._
import graft.ops.AsOfJoin
import graft.sources.TableSource

/** The bucketed co-located layout end-to-end (TableSource.writeBucketed):
  * both tables written bucketed by entity with one file per bucket and
  * per-bucket (entity, ts) sort, then the custom as-of merge join PLUS a
  * downstream lag window and per-entity aggregate — the flagship's stage
  * chain — must plan with ZERO exchanges and ZERO sorts. This is the
  * local analog of the Iceberg bucket-transform + sorted-write-order
  * layout: at 100 TB the corpus is written co-located once and every
  * downstream batch job reads it shuffle-free. */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("as-of merge + lag window + agg over co-bucketed tables: zero exchange, zero sort") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bucketed").toString
    val probe = (0 until 400).map(i => (i % 7L, i.toLong, i * 1.5))
      .toDF("entity", "ts", "v")
    val build = (0 until 80).map(i => (i % 7L, (i * 5).toLong, s"lab$i"))
      .toDF("entity", "lts", "label")
    TableSource.writeBucketed(probe, "bj_probe", s"$dir/probe", 4,
      "entity", Seq("entity", "ts"))
    TableSource.writeBucketed(build, "bj_build", s"$dir/build", 4,
      "entity", Seq("entity", "lts"))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("entity").orderBy("ts")
    def chain(p: org.apache.spark.sql.DataFrame,
              b: org.apache.spark.sql.DataFrame) =
      AsOfJoin.asOfSortMerge(p, b, "entity", "ts", "lts", Seq("label"),
          dedupeLatest = false)
        .withColumn("dv", col("v") - lag("v", 1).over(w))
        .groupBy("entity")
        .agg(count(lit(1)).as("n"), round(sum("dv"), 6).as("sdv"),
          count("label").as("labeled"))

    // Default read path: ZERO exchanges end-to-end (the 100 TB win — no
    // network). Spark ≥3.0 ignores bucket sort order by default, so the
    // two remaining Sorts are partition-LOCAL (no shuffle feeding them).
    val out = chain(spark.table("bj_probe"), spark.table("bj_build"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfMergeJoin"), s"custom exec missing:\n$plan")
    assert(!plan.contains("Exchange"), s"bucketed layout still shuffles:\n$plan")

    // With the sorted-bucket-scan conf on (one file per bucket, which
    // writeBucketed guarantees), even the local sorts elide: the scan
    // itself reports the (entity, ts) write order.
    val orderingConf = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    spark.conf.set(orderingConf, "true")
    try {
      val sorted = chain(spark.table("bj_probe"), spark.table("bj_build"))
      val sortedPlan = sorted.queryExecution.executedPlan.toString
      assert(!sortedPlan.contains("Exchange"), s"shuffles:\n$sortedPlan")
      assert("\\bSort \\[".r.findFirstIn(sortedPlan).isEmpty,
        s"bucketed sort order not exploited:\n$sortedPlan")
      assertSameRows(sorted, chain(probe, build))
    } finally spark.conf.unset(orderingConf)

    // same numbers as the un-bucketed run of the same chain (which IS
    // allowed to shuffle) — layout changes the plan, never the result
    assertSameRows(out, chain(probe, build))

    // the bucketed table is a first-class TableSource citizen: the
    // `table:` spec reads it with bucketing metadata intact
    val viaSpec = TableSource.load(spark, "table:bj_probe", (_, _) => probe)
    assert(viaSpec.count() == 400)
    assertSameRows(chain(viaSpec, spark.table("bj_build")), chain(probe, build))
  }

  test("the FULL flagship feature chain over co-bucketed inputs: zero exchange") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bucketed-fs").toString
    val imgs = graft.sources.SynthImages.images(spark, 2000, 16)
    val lbls = graft.sources.SynthImages.labels(spark, 2000, 16)
    TableSource.writeBucketed(imgs, "bf_images", s"$dir/images", 4,
      "phash", Seq("phash", "ts"))
    TableSource.writeBucketed(lbls, "bf_labels", s"$dir/labels", 4,
      "phash", Seq("phash", "label_ts"))
    val out = graft.pipeline.FeaturePipeline.features(
      spark.table("bf_images"), spark.table("bf_labels"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfMergeJoin"), s"custom exec missing:\n$plan")
    // prepare (narrow) -> as-of merge -> lag/session windows -> final
    // (entity, window) agg: every stage's distribution is satisfied by the
    // phash bucketing (incl. the label dedup agg, whose (phash, label_ts)
    // clustering the phash partitioning subsumes)
    assert(!plan.contains("Exchange"),
      s"flagship still shuffles over bucketed inputs:\n$plan")
    // identical feature vectors to the in-memory (shuffled) run
    assertSameRows(out, graft.pipeline.FeaturePipeline.features(imgs, lbls))
  }

  test("registerBucketed re-attaches an existing layout exchange-free") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bucketed-rr").toString
    val probe = (0 until 60).map(i => (i % 5L, i.toLong, i * 2.0))
      .toDF("entity", "ts", "v")
    val build = (0 until 12).map(i => (i % 5L, (i * 4).toLong, s"r$i"))
      .toDF("entity", "lts", "label")
    TableSource.writeBucketed(probe, "rr_probe", s"$dir/probe", 4,
      "entity", Seq("entity", "ts"))
    TableSource.writeBucketed(build, "rr_build", s"$dir/build", 4,
      "entity", Seq("entity", "lts"))
    // a fresh batch job: the catalog entries are gone (simulated by DROP),
    // only the files remain — re-declare the layout over them
    spark.sql("DROP TABLE rr_probe"); spark.sql("DROP TABLE rr_build")
    TableSource.registerBucketed(spark, "rr_probe", s"$dir/probe", 4,
      "entity", Seq("entity", "ts"))
    TableSource.registerBucketed(spark, "rr_build", s"$dir/build", 4,
      "entity", Seq("entity", "lts"))
    val joined = AsOfJoin.asOfSortMerge(spark.table("rr_probe"),
      spark.table("rr_build"), "entity", "ts", "lts", Seq("label"),
      dedupeLatest = false)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfMergeJoin") && !plan.contains("Exchange"),
      s"re-attached layout not exchange-free:\n$plan")
    assert(joined.count() == 60)
  }

  test("non-bucketed inputs to the same chain do shuffle (the gate bites)") {
    val probe = (0 until 50).map(i => (i % 3L, i.toLong, i * 0.5))
      .toDF("entity", "ts", "v")
    val build = (0 until 10).map(i => (i % 3L, (i * 5).toLong, s"l$i"))
      .toDF("entity", "lts", "label")
    val joined = AsOfJoin.asOfSortMerge(probe, build, "entity", "ts", "lts",
      Seq("label"), dedupeLatest = false)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("Exchange"),
      s"expected exchanges on unbucketed inputs:\n$plan")
  }
}
