package graft.streaming

import graft.SparkSpec
import graft.pipeline.Incremental
import graft.sources.SnapshotTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files
import java.sql.Timestamp

/** Streaming ingest -> snapshot commits -> incremental batch consumption:
  * the full arrival-to-feature loop over the versioned corpus. */
class SnapshotIngestSpec extends SparkSpec {
  import spark.implicits._

  test("each micro-batch commits one tagged snapshot; replays are skipped") {
    implicit val ctx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-ingest").toString
    val ckpt = Files.createTempDirectory("graft-ingest-ckpt").toString
    val in = MemoryStream[(Long, Timestamp, Double)]
    val q = SnapshotIngest.start(
      in.toDF.toDF("phash", "ts", "value"), dir, ckpt, source = "img")
    try {
      in.addData((1L, ts("2024-01-01 00:01:00"), 2.0),
        (2L, ts("2024-01-01 00:02:00"), 3.0))
      q.processAllAvailable()
      in.addData((3L, ts("2024-01-01 00:03:00"), 4.0))
      q.processAllAvailable()
    } finally q.stop()

    val snaps = SnapshotTable.snapshots(dir)
    assert(snaps.nonEmpty && snaps.forall(_.tag.exists(_.startsWith("img:batch-"))))
    assert(SnapshotTable.read(spark, dir).count() === 3L)

    // a restarted query replays the last epoch: same tag -> no double append
    val lastEpoch = snaps.last.tag.get.stripPrefix("img:batch-").toLong
    val replay = Seq((3L, ts("2024-01-01 00:03:00"), 4.0))
      .toDF("phash", "ts", "value")
    assert(!SnapshotIngest.commitOnce(replay, dir, "img", lastEpoch))
    assert(SnapshotTable.read(spark, dir).count() === 3L)
    // a genuinely new epoch still commits
    assert(SnapshotIngest.commitOnce(replay, dir, "img", lastEpoch + 1))
    assert(SnapshotTable.read(spark, dir).count() === 4L)
  }

  test("bucketed streaming ingest: micro-batches keep the layout, compaction collapses them") {
    implicit val ctx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-ingest-bkt").toString
    val ckpt = Files.createTempDirectory("graft-ingest-bkt-ckpt").toString
    val spec = SnapshotTable.BucketSpec(4, "phash", Seq("phash", "ts"))
    val in = MemoryStream[(Long, Timestamp, Double)]
    val q = SnapshotIngest.start(in.toDF.toDF("phash", "ts", "value"),
      dir, ckpt, source = "cam", bucketSpec = Some(spec))
    try {
      in.addData((0 until 40).map(i =>
        (i.toLong, ts(f"2024-01-01 00:${i % 60}%02d:00"), i * 1.0)): _*)
      q.processAllAvailable()
      in.addData((40 until 60).map(i =>
        (i.toLong, ts(f"2024-01-01 01:${i % 60}%02d:00"), i * 1.0)): _*)
      q.processAllAvailable()
    } finally q.stop()

    // every commit carries the spec and ADDS one file per bucket (files
    // is the cumulative live set; the commit's own delta is addedAt == id)
    val snaps = SnapshotTable.snapshots(dir).filter(_.files.nonEmpty)
    assert(snaps.size >= 2 && snaps.forall(_.bucketSpec.contains(spec)))
    assert(snaps.forall(s => s.files.count(_.addedAt == s.id) === 4))
    // the bucketed read attaches the layout: entity-keyed agg, no exchange
    val agg = SnapshotTable.readBucketed(spark, dir)
      .groupBy("phash").count()
    assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"),
      "bucketed ingest must keep entity-keyed work exchange-free")
    assert(agg.count() === 60L)
    // a replayed epoch is still detected through the bucketed path
    val lastEpoch = snaps.last.tag.get.stripPrefix("cam:batch-").toLong
    val replay = Seq((59L, ts("2024-01-01 01:59:00"), 59.0))
      .toDF("phash", "ts", "value")
    assert(!SnapshotIngest.commitOnce(replay, dir, "cam", lastEpoch,
      bucketSpec = Some(spec)))
    // maintenance compaction collapses the per-batch files, keeps the layout
    val compacted = SnapshotTable.compact(spark, dir)
    assert(compacted.bucketSpec.contains(spec) && compacted.files.size === 4)
    assert(SnapshotTable.readBucketed(spark, dir).count() === 60L)
  }

  test("replay dedup survives retention GC expiring every tagged manifest") {
    val dir = Files.createTempDirectory("graft-ingest-gc").toString
    val batch = Seq((1L, 2.0)).toDF("phash", "value")
    assert(SnapshotIngest.commitOnce(batch, dir, "img", 0L))
    assert(SnapshotIngest.commitOnce(batch, dir, "img", 1L))
    // another source's commits push every img-tagged manifest out of the
    // retention window
    SnapshotTable.append(spark, dir, batch)
    SnapshotTable.append(spark, dir, batch)
    SnapshotTable.expireSnapshots(dir, keepLast = 2, orphanMinAgeMs = 0L)
    assert(SnapshotTable.snapshots(dir).forall(_.tag.isEmpty),
      "precondition: no img-tagged manifest survives")
    // the durable meta/source-img.txt high-water mark must still detect the
    // replayed epochs — without it this double-appends
    assert(SnapshotIngest.readEpoch(dir, "img") === Some(1L))
    assert(!SnapshotIngest.commitOnce(batch, dir, "img", 0L))
    assert(!SnapshotIngest.commitOnce(batch, dir, "img", 1L))
    // a genuinely new epoch still commits and advances the mark
    assert(SnapshotIngest.commitOnce(batch, dir, "img", 2L))
    assert(SnapshotIngest.readEpoch(dir, "img") === Some(2L))
  }

  test("incremental consumer processes exactly what arrived since its cursor") {
    val dir = Files.createTempDirectory("graft-inc").toString
    val cursor = s"$dir.cursor"
    def batch(from: Int, until: Int) =
      (from until until).map(i => (i.toLong, i * 1.0)).toDF("id", "v")

    // nothing to process on an empty table
    assert(Incremental.processNew(spark, dir, cursor)(_ => fail("ran on empty")) === None)

    // bootstrap: cursor 0 processes the full current snapshot
    SnapshotTable.append(spark, dir, batch(0, 10))
    SnapshotTable.append(spark, dir, batch(10, 25))
    var seen = Seq.empty[Long]
    assert(Incremental.processNew(spark, dir, cursor) { df =>
      seen = df.select("id").as[Long].collect().toSeq.sorted
    } === Some((0L, 2L)))
    assert(seen === (0L until 25L))

    // steady state: only the new commit's rows
    SnapshotTable.append(spark, dir, batch(25, 30))
    assert(Incremental.processNew(spark, dir, cursor) { df =>
      seen = df.select("id").as[Long].collect().toSeq.sorted
    } === Some((2L, 3L)))
    assert(seen === (25L until 30L))

    // idle: no new commits -> no job invocation
    assert(Incremental.processNew(spark, dir, cursor)(_ => fail("ran with no new data")) === None)

    // an empty commit (an empty micro-batch) yields an empty delta with
    // the table's schema, not a refusal
    SnapshotTable.append(spark, dir, batch(0, 0))
    assert(Incremental.processNew(spark, dir, cursor) { df =>
      assert(df.columns.toSeq === Seq("id", "v"))
      assert(df.count() === 0L)
    } === Some((3L, 4L)))

    // an overwrite breaks incremental history loudly, not silently
    SnapshotTable.overwrite(spark, dir, batch(0, 5))
    intercept[IllegalArgumentException] {
      Incremental.processNew(spark, dir, cursor)(_ => ())
    }
    // cursor did NOT advance past the failure
    assert(Incremental.readCursor(cursor) === 4L)
  }
}
