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
