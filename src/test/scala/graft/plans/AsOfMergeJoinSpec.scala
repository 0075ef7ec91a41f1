package graft.plans

import graft.SparkSpec
import graft.ops.AsOfJoin
import graft.sources.SynthImages
import org.apache.spark.sql.functions._

/** The custom Catalyst sort-merge as-of exec must be semantically identical
  * to the union+window formulation on every edge the window path is tested
  * on, and its physical plan must be the merge exec over co-partitioned
  * sorted children. */
class AsOfMergeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def probe = Seq(
    (1L, ts("2024-01-01 00:10:00"), "e1"),
    (1L, ts("2024-01-01 00:20:00"), "e2"),
    (1L, ts("2024-01-01 00:30:00"), "e3"),
    (2L, ts("2024-01-01 00:05:00"), "e4"),
    (3L, ts("2024-01-01 00:01:00"), "e5")
  ).toDF("entity", "ts", "event_id")

  private def build = Seq(
    (1L, ts("2024-01-01 00:10:00"), "A", 1.0),
    (1L, ts("2024-01-01 00:15:00"), "B", 2.0),
    (1L, ts("2024-01-01 00:40:00"), "Z", 9.0),
    (3L, ts("2024-01-01 00:02:00"), "C", 3.0)
  ).toDF("entity", "label_ts", "label", "weight")

  test("edge semantics match the window formulation exactly") {
    val got = AsOfJoin.asOfSortMerge(probe, build, "entity", "ts", "label_ts",
        Seq("label", "weight"))
      .select("event_id", "label", "weight")
      .collect().map(r => (r.getString(0), r.get(1), r.get(2))).toSet
    assert(got === Set(
      ("e1", "A", 1.0), ("e2", "B", 2.0), ("e3", "B", 2.0),
      ("e4", null, null), ("e5", null, null)))
  }

  test("merge exec == window formulation on synthesized data (all edges)") {
    val imgs = SynthImages.images(spark, 2000, 16)
      .select("image_id", "phash", "ts") // slim probe
    val lbls = SynthImages.labels(spark, 2000, 16)
    val win = AsOfJoin.asOf(imgs, lbls, "phash", "ts", "label_ts", Seq("label", "weight"))
    val smj = AsOfJoin.asOfSortMerge(imgs, lbls, "phash", "ts", "label_ts", Seq("label", "weight"))
    assertSameRows(win, smj)
  }

  test("dedupeLatest=false: unmatched probes project NULL for non-nullable payloads") {
    // regression: without the dedupe max() agg nothing forces payload
    // nullability, so the result projection must re-bind the payload attrs
    // as nullable or unmatched rows project garbage (0.0) instead of NULL
    val got = AsOfJoin.asOfSortMerge(probe, build, "entity", "ts", "label_ts",
        Seq("label", "weight"), dedupeLatest = false)
      .select("event_id", "label", "weight")
      .collect().map(r => (r.getString(0), r.get(1), r.get(2))).toSet
    assert(got === Set(
      ("e1", "A", 1.0), ("e2", "B", 2.0), ("e3", "B", 2.0),
      ("e4", null, null), ("e5", null, null)))
  }

  test("physical plan: AsOfMergeJoin over sorted co-partitioned exchanges") {
    val df = AsOfJoin.asOfSortMerge(probe, build, "entity", "ts", "label_ts", Seq("label"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfMergeJoin"), s"custom exec not planned:\n$plan")
    assert("Sort \\[".r.findAllIn(plan).length >= 2, s"children not sorted:\n$plan")
    assert(!plan.contains("Window"), s"window fallback leaked in:\n$plan")
  }

  test("partitioning invariance of the merge exec") {
    val a = AsOfJoin.asOfSortMerge(probe.repartition(7), build.repartition(2),
      "entity", "ts", "label_ts", Seq("label", "weight"))
    val b = AsOfJoin.asOfSortMerge(probe.repartition(1), build.repartition(5),
      "entity", "ts", "label_ts", Seq("label", "weight"))
    assertSameRows(a, b)
  }

  test("DATE build ts against TIMESTAMP probe ts is coerced, not byte-compared") {
    val p = Seq((1L, ts("2024-06-15 12:00:00"), "e1")).toDF("entity", "ts", "event_id")
    val b = Seq(
      (1L, java.sql.Date.valueOf("2024-06-15"), "A"), // midnight <= probe -> match
      (1L, java.sql.Date.valueOf("2024-06-16"), "B")  // future -> excluded
    ).toDF("entity", "label_ts", "label")
    val got = AsOfJoin.asOfSortMerge(p, b, "entity", "ts", "label_ts", Seq("label"))
      .collect().map(_.getAs[String]("label")).toSeq
    assert(got === Seq("A"))
  }

  test("null build keys/ts never match (SQL ASOF semantics) in both paths") {
    val p = Seq((1L, ts("2024-06-15 12:00:00"), "e1")).toDF("entity", "ts", "event_id")
    val b = Seq(
      (Option.empty[Long], Option(ts("2024-06-15 00:00:00")), "NK"), // null key
      (Option(1L), Option.empty[java.sql.Timestamp], "NT")           // null ts
    ).toDF("entity", "label_ts", "label")
    Seq(
      AsOfJoin.asOf(p, b, "entity", "ts", "label_ts", Seq("label")),
      AsOfJoin.asOfSortMerge(p, b, "entity", "ts", "label_ts", Seq("label"))
    ).foreach { df =>
      val got = df.collect()
      assert(got.length === 1 && got(0).isNullAt(got(0).fieldIndex("label")))
    }
  }

  test("string entity keys merge correctly (non-primitive ordering + copies)") {
    val p = Seq(("u1", ts("2024-01-01 00:10:00"), 1), ("u2", ts("2024-01-01 00:10:00"), 2))
      .toDF("entity", "ts", "n")
    val b = Seq(("u1", ts("2024-01-01 00:05:00"), "x"), ("u2", ts("2024-01-01 00:20:00"), "y"))
      .toDF("entity", "label_ts", "label")
    val got = AsOfJoin.asOfSortMerge(p, b, "entity", "ts", "label_ts", Seq("label"))
      .collect().map(r => (r.getInt(2), Option(r.getString(3)))).toSet
    assert(got === Set((1, Some("x")), (2, None)))
  }
}
