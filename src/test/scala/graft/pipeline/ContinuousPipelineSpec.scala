package graft.pipeline

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.sources.{SnapshotTable, SynthImages}
import graft.streaming.SnapshotIngest

/** The full continuous pipeline, end to end: streaming ingest lands
  * micro-batches as corpus snapshot commits, ContinuousFeatures turns
  * every arrival into flagship feature rows appended to a feature
  * SnapshotTable — and the result equals the one-shot batch run exactly,
  * with every window emitted once across ingest replays, cursor rewinds,
  * and duplicate maintenance runs. */
class ContinuousPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val N = 400L
  private val Entities = 8

  private def allImages: DataFrame = SynthImages.images(spark, N, Entities)
  private def labels: DataFrame = SynthImages.labels(spark, N, Entities)

  /** The corpus rows as ts-ordered tuples for the memory stream. */
  private def orderedRows: Seq[(String, Array[Byte], Int, Int, String,
      String, Long, Timestamp)] =
    allImages.orderBy(col("ts"), col("image_id")).collect().toSeq.map { r =>
      (r.getString(0), r.getAs[Array[Byte]](1), r.getInt(2), r.getInt(3),
        r.getString(4), r.getString(5), r.getLong(6), r.getTimestamp(7))
    }

  /** One-shot batch reference restricted to windows below `boundSec`. */
  private def reference(boundSec: Long): DataFrame =
    FeaturePipeline.features(allImages, labels)
      .where(unix_timestamp(col("window_start")) < boundSec)

  test("stream -> corpus commits -> feature maintenance == one-shot batch run") {
    implicit val ctx = spark.sqlContext
    val corpus = Files.createTempDirectory("graft-cont-corpus").toString
    val feats = Files.createTempDirectory("graft-cont-feats").toString
    val ckpt = Files.createTempDirectory("graft-cont-ckpt").toString
    val cursor = s"$feats.cursor"
    val lbl = labels

    val rows = orderedRows
    val slices = Seq(rows.slice(0, 130), rows.slice(130, 290),
      rows.slice(290, rows.length))
    val in = MemoryStream[(String, Array[Byte], Int, Int, String, String,
      Long, Timestamp)]
    // a stats-bearing ingest writes MICROS timestamps (INT96, the legacy
    // default, carries no footer stats the manifest layer will trust —
    // the SnapshotTableSpec unit-mismatch cases); the stream clones the
    // session conf at start
    val tsKey = "spark.sql.parquet.outputTimestampType"
    val prior = spark.conf.get(tsKey)
    spark.conf.set(tsKey, "TIMESTAMP_MICROS")
    val q = SnapshotIngest.start(
      in.toDF.toDF("image_id", "bytes", "w", "h", "fmt", "caption",
        "phash", "ts"),
      corpus, ckpt, source = "cam", statsCols = Seq("ts"))
    try {
      slices.zipWithIndex.foreach { case (slice, i) =>
        in.addData(slice: _*)
        q.processAllAvailable()
        // a maintenance cycle after every arrival
        val r = ContinuousFeatures.cycle(spark, corpus, lbl, feats, cursor)
        assert(r.isDefined, s"cycle $i saw no new snapshot")
        // nothing more to do until the next arrival
        assert(ContinuousFeatures.cycle(spark, corpus, lbl, feats, cursor).isEmpty)
      }
    } finally { q.stop(); spark.conf.set(tsKey, prior) }

    val head = SnapshotTable.currentSnapshotId(corpus).get
    assert(head === 3L, "each micro-batch must land exactly one commit")
    // ts stats rode the manifests, so the watermark never scanned data
    assert(SnapshotTable.snapshot(corpus, head).files
      .forall(_.stats.exists(_._1 == "ts")))

    val bound = ContinuousFeatures.boundarySec(spark, corpus, head, "ts", 600L, 0L)
    val got = SnapshotTable.read(spark, feats)
    // every closed window exactly once...
    assert(got.select(col("entity"), col("window_start")).distinct().count()
      === got.count())
    // ...open windows withheld (nothing at or past the watermark boundary)
    assert(got.where(unix_timestamp(col("window_start")) >= bound).isEmpty)
    // ...and bit-equal to the one-shot batch run over the same corpus:
    // closed-window values can't depend on later rows (lag/session are
    // preceding-row-only), so incremental == full must hold exactly
    assertSameRows(got, reference(bound))

    // the final arrival closes earlier windows: all three cycles emitted
    assert(SnapshotTable.snapshots(feats).count(_.files.nonEmpty) >= 2)
  }

  test("kill/restart seams: cursor rewind, duplicate run, ingest replay") {
    val corpus = Files.createTempDirectory("graft-cont2-corpus").toString
    val feats = Files.createTempDirectory("graft-cont2-feats").toString
    val cursor = s"$feats.cursor"
    val lbl = labels

    val rows = orderedRows
    // the foreachBatch body, driven directly (SnapshotIngestSpec covers the
    // streaming harness; the seams here are the maintenance job's)
    assert(SnapshotIngest.commitOnce(
      rows.slice(0, 200).toDF("image_id", "bytes", "w", "h", "fmt",
        "caption", "phash", "ts"), corpus, "cam", 0L, Seq("ts")))
    assert(ContinuousFeatures.cycle(spark, corpus, lbl, feats, cursor).isDefined)
    val afterOne = SnapshotTable.read(spark, feats).collect().toSeq
    val featHead = SnapshotTable.currentSnapshotId(feats)

    // crash A: maintenance died between its feature commit and the cursor
    // write — the replayed window re-derives the same tag and is skipped
    Files.write(java.nio.file.Paths.get(cursor), "0".getBytes("UTF-8"))
    assert(ContinuousFeatures.cycle(spark, corpus, lbl, feats, cursor)
      === Some((0L, 1L)))
    assert(SnapshotTable.currentSnapshotId(feats) === featHead,
      "replayed cycle must not re-append")

    // crash B: the stream restarted and replayed its in-flight epoch — the
    // ingest tag dedups it, so no new corpus snapshot, so no new cycle
    assert(!SnapshotIngest.commitOnce(
      rows.slice(0, 200).toDF("image_id", "bytes", "w", "h", "fmt",
        "caption", "phash", "ts"), corpus, "cam", 0L, Seq("ts")))
    assert(ContinuousFeatures.cycle(spark, corpus, lbl, feats, cursor).isEmpty)

    // normal resume: the NEXT epoch lands and its windows extend the table
    // without touching the already-emitted ones
    assert(SnapshotIngest.commitOnce(
      rows.slice(200, 400).toDF("image_id", "bytes", "w", "h", "fmt",
        "caption", "phash", "ts"), corpus, "cam", 1L, Seq("ts")))
    assert(ContinuousFeatures.cycle(spark, corpus, lbl, feats, cursor)
      === Some((1L, 2L)))
    val all = SnapshotTable.read(spark, feats)
    assert(all.select(col("entity"), col("window_start")).distinct().count()
      === all.count())
    // the first cycle's rows are still there, byte-identical (appends only)
    val afterOneDf = spark.createDataFrame(
      java.util.Arrays.asList(afterOne: _*),
      SnapshotTable.read(spark, feats).schema)
    assert(all.join(afterOneDf,
      Seq("entity", "window_start"), "left_semi").count() === afterOne.length)

    val bound = ContinuousFeatures.boundarySec(spark, corpus,
      SnapshotTable.currentSnapshotId(corpus).get, "ts", 600L, 0L)
    assertSameRows(all, reference(bound))
  }

  test("scheduled corpus compaction between cycles: the loop keeps running") {
    // the composition the replace operation exists for: maintenance
    // compacts the corpus WHILE the feature loop's cursor sits at a
    // pre-compaction snapshot — the next cycle's changes window crosses
    // the replace commit and must deliver exactly the post-cursor appends
    val corpus = Files.createTempDirectory("graft-cont4-corpus").toString
    val feats = Files.createTempDirectory("graft-cont4-feats").toString
    val cursor = s"$feats.cursor"
    val rows = orderedRows
    def slice(a: Int, b: Int) = rows.slice(a, b).toDF("image_id", "bytes",
      "w", "h", "fmt", "caption", "phash", "ts")
    // stats-bearing writes need MICROS timestamps (INT96 footers carry no
    // trusted stats — see the first test); the compaction REWRITE writes
    // with the session conf too, so it applies to the whole flow here
    val tsKey = "spark.sql.parquet.outputTimestampType"
    val prior = spark.conf.get(tsKey)
    spark.conf.set(tsKey, "TIMESTAMP_MICROS")
    try {
      assert(SnapshotIngest.commitOnce(slice(0, 150), corpus, "cam", 0L, Seq("ts")))
      assert(SnapshotIngest.commitOnce(slice(150, 250), corpus, "cam", 1L, Seq("ts")))
      assert(ContinuousFeatures.cycle(spark, corpus, labels, feats, cursor)
        === Some((0L, 2L)))
      // the maintenance pass rewrites the fragmented ingest (stats inherited)
      val compacted = SnapshotTable.compact(spark, corpus)
      assert(compacted.operation === "replace")
      assert(compacted.files.forall(_.stats.exists(_._1 == "ts")),
        "compaction must inherit the ingest's ts stats")
      // the loop continues across the rewrite without a cursor reset
      assert(SnapshotIngest.commitOnce(slice(250, 400), corpus, "cam", 2L, Seq("ts")))
      assert(ContinuousFeatures.cycle(spark, corpus, labels, feats, cursor)
        === Some((2L, 4L)))
      val all = SnapshotTable.read(spark, feats)
      assert(all.select(col("entity"), col("window_start")).distinct().count()
        === all.count())
      val bound = ContinuousFeatures.boundarySec(spark, corpus,
        SnapshotTable.currentSnapshotId(corpus).get, "ts", 600L, 0L)
      assertSameRows(all, reference(bound))
    } finally spark.conf.set(tsKey, prior)
  }

  test("a numeric event-time column is refused loudly, not silently never-emitting") {
    // boundary arithmetic assumes TimestampType (epoch-micros stats,
    // unix_timestamp filter); on a BIGINT epoch column both silently
    // produce a boundary near zero and the loop would never emit
    val corpus = Files.createTempDirectory("graft-cont5-corpus").toString
    val feats = Files.createTempDirectory("graft-cont5-feats").toString
    SnapshotTable.append(spark, corpus, spark.range(100)
      .select(col("id").as("phash"), (col("id") * 60L).as("ts_sec")))
    val err = intercept[IllegalArgumentException] {
      ContinuousFeatures.cycle(spark, corpus, labels, feats,
        s"$feats.cursor", tsCol = "ts_sec")
    }
    assert(err.getMessage.contains("TimestampType"))
  }

  test("moved-head crash: feature commit landed, cursor did not, corpus advanced") {
    // the seam a window-pair tag cannot close: the replay's window differs
    // from the crashed cycle's, so only boundary-coverage idempotency
    // (emittedBound from the feature table's own committed state) prevents
    // re-emitting every window below the old boundary
    val corpus = Files.createTempDirectory("graft-cont3-corpus").toString
    val feats = Files.createTempDirectory("graft-cont3-feats").toString
    val cursor = s"$feats.cursor"
    val rows = orderedRows
    def slice(a: Int, b: Int) = rows.slice(a, b).toDF("image_id", "bytes",
      "w", "h", "fmt", "caption", "phash", "ts")

    assert(SnapshotIngest.commitOnce(slice(0, 200), corpus, "cam", 0L, Seq("ts")))
    assert(ContinuousFeatures.cycle(spark, corpus, labels, feats, cursor)
      === Some((0L, 1L)))
    val emitted1 = SnapshotTable.read(spark, feats).count()
    assert(emitted1 > 0)

    // the crash: cursor never written, AND a new epoch lands first
    Files.write(java.nio.file.Paths.get(cursor), "0".getBytes("UTF-8"))
    assert(SnapshotIngest.commitOnce(slice(200, 400), corpus, "cam", 1L, Seq("ts")))
    assert(ContinuousFeatures.cycle(spark, corpus, labels, feats, cursor)
      === Some((0L, 2L)))

    val all = SnapshotTable.read(spark, feats)
    assert(all.select(col("entity"), col("window_start")).distinct().count()
      === all.count(), "the moved-head replay duplicated emitted windows")
    val bound = ContinuousFeatures.boundarySec(spark, corpus,
      SnapshotTable.currentSnapshotId(corpus).get, "ts", 600L, 0L)
    assertSameRows(all, reference(bound))
  }

  test("closed-window repair: historical takedown and upsert re-derive affected entities") {
    val corpus = Files.createTempDirectory("graft-cont6-corpus").toString
    val feats = Files.createTempDirectory("graft-cont6-feats").toString
    val cursor = s"$feats.cursor"
    val rows = orderedRows
    def slice(a: Int, b: Int) = rows.slice(a, b).toDF("image_id", "bytes",
      "w", "h", "fmt", "caption", "phash", "ts")
    assert(SnapshotIngest.commitOnce(slice(0, 250), corpus, "cam", 0L, Seq("ts")))
    assert(SnapshotIngest.commitOnce(slice(250, 400), corpus, "cam", 1L, Seq("ts")))
    assert(ContinuousFeatures.cycle(spark, corpus, labels, feats, cursor)
      === Some((0L, 2L)))
    val boundSec = ContinuousFeatures.boundarySec(spark, corpus, 2L, "ts", 600L, 0L)

    // the takedown rewrites HISTORY below the emitted boundary: one entity
    // loses every row (the vanished path), another loses a deterministic
    // half of its below-bound rows (the replaced path)
    val below = allImages.where(unix_timestamp(col("ts")) < boundSec)
    val ents = below.select("phash").distinct().orderBy("phash")
      .collect().map(_.getLong(0))
    val (eGone, ePart) = (ents(0), ents(1))
    val takedown = allImages.where(col("phash") === eGone)
      .select("image_id")
      .unionByName(below.where(col("phash") === ePart &&
        pmod(xxhash64(col("image_id")), lit(2)) === 0).select("image_id"))
    val del = SnapshotTable.deleteKeys(spark, corpus, "image_id", takedown)
    val n = ContinuousFeatures.repairClosedWindows(spark, corpus, labels,
      feats, del.id - 1, del.id)
    assert(n === 2, s"exactly the two touched entities repair, got $n")
    val modified = allImages.join(takedown, Seq("image_id"), "left_anti")
    def expected(imgs: DataFrame) =
      FeaturePipeline.features(imgs, labels)
        .where(unix_timestamp(col("window_start")) < boundSec)
    assertSameRows(SnapshotTable.read(spark, feats), expected(modified))

    // re-running the same repair is a no-op in effect (crash-heal path)
    assert(ContinuousFeatures.repairClosedWindows(spark, corpus, labels,
      feats, del.id - 1, del.id) === 2)
    assertSameRows(SnapshotTable.read(spark, feats), expected(modified))

    // a content UPSERT below the boundary: a third entity's below-bound
    // rows get its own first row's bytes — brightness aggregates change,
    // and the repair must converge to the substituted corpus
    val e3 = ents(2)
    val newBytes = modified.where(col("phash") === e3)
      .orderBy("image_id").select("bytes").head().getAs[Array[Byte]](0)
    val batch = modified.where(col("phash") === e3 &&
        unix_timestamp(col("ts")) < boundSec)
      .withColumn("bytes", lit(newBytes))
    val up = SnapshotTable.upsert(spark, corpus, "image_id", batch)
    assert(ContinuousFeatures.repairClosedWindows(spark, corpus, labels,
      feats, up.id - 1, up.id) === 1)
    val modified2 = modified.join(batch.select("image_id"),
        Seq("image_id"), "left_anti")
      .unionByName(batch)
    assertSameRows(SnapshotTable.read(spark, feats), expected(modified2))

    // changes ABOVE the boundary repair nothing (future cycles own them)
    val futureIds = allImages
      .where(unix_timestamp(col("ts")) >= boundSec && col("phash") === ents(3))
      .select("image_id").limit(1)
    val del2 = SnapshotTable.deleteKeys(spark, corpus, "image_id", futureIds)
    assert(ContinuousFeatures.repairClosedWindows(spark, corpus, labels,
      feats, del2.id - 1, del2.id) === 0)
  }

  test("closed-window repair after later cycles preserves the newly emitted windows") {
    // the seam the head-read fix closes: a repair pinned at the takedown
    // window's end would lack the corpus rows behind windows a LATER
    // cycle emitted for the same entity, and the per-entity upsert would
    // erase them
    val corpus = Files.createTempDirectory("graft-cont7-corpus").toString
    val feats = Files.createTempDirectory("graft-cont7-feats").toString
    val cursor = s"$feats.cursor"
    val rows = orderedRows
    def slice(a: Int, b: Int) = rows.slice(a, b).toDF("image_id", "bytes",
      "w", "h", "fmt", "caption", "phash", "ts")
    assert(SnapshotIngest.commitOnce(slice(0, 200), corpus, "cam", 0L, Seq("ts")))
    assert(ContinuousFeatures.cycle(spark, corpus, labels, feats, cursor)
      === Some((0L, 1L)))
    val b1 = ContinuousFeatures.boundarySec(spark, corpus, 1L, "ts", 600L, 0L)
    val eAff = allImages.where(unix_timestamp(col("ts")) < b1)
      .select("phash").distinct().orderBy("phash").head().getLong(0)
    val takedown = allImages.where(col("phash") === eAff &&
        unix_timestamp(col("ts")) < b1 &&
        pmod(xxhash64(col("image_id")), lit(2)) === 0)
      .select("image_id")
    assert(takedown.count() > 0, "vacuous takedown — pick a different entity")
    val del = SnapshotTable.deleteKeys(spark, corpus, "image_id", takedown)
    // more ingest + a cycle raise the bound and emit eAff's newer windows
    assert(SnapshotIngest.commitOnce(slice(200, 400), corpus, "cam", 1L, Seq("ts")))
    assert(ContinuousFeatures.cycle(spark, corpus, labels, feats, cursor).isDefined)
    val b2 = ContinuousFeatures.boundarySec(spark, corpus,
      SnapshotTable.currentSnapshotId(corpus).get, "ts", 600L, 0L)
    assert(b2 > b1, "the second ingest must close more windows")
    // the repair of the OLD takedown window runs AFTER the bound moved
    assert(ContinuousFeatures.repairClosedWindows(spark, corpus, labels,
      feats, del.id - 1, del.id) === 1)
    val modified = allImages.join(takedown, Seq("image_id"), "left_anti")
    assertSameRows(SnapshotTable.read(spark, feats),
      FeaturePipeline.features(modified, labels)
        .where(unix_timestamp(col("window_start")) < b2))
  }

  test("maintain: one scheduled call advances windows AND heals the takedown it crossed") {
    val corpus = Files.createTempDirectory("graft-cont8-corpus").toString
    val feats = Files.createTempDirectory("graft-cont8-feats").toString
    val cursor = s"$feats.cursor"
    val mark = java.nio.file.Paths.get(feats, "meta", "repair-upto.txt")
    val rows = orderedRows
    def slice(a: Int, b: Int) = rows.slice(a, b).toDF("image_id", "bytes",
      "w", "h", "fmt", "caption", "phash", "ts")
    assert(SnapshotIngest.commitOnce(slice(0, 200), corpus, "cam", 0L, Seq("ts")))
    assert(ContinuousFeatures.maintain(spark, corpus, labels, feats, cursor)
      === Some((0L, 1L)))
    assert(Incremental.readLongFile(mark) === Some(1L),
      "bootstrap adopts the head without retroactive repair")
    val b1 = ContinuousFeatures.boundarySec(spark, corpus, 1L, "ts", 600L, 0L)
    val eAff = allImages.where(unix_timestamp(col("ts")) < b1)
      .select("phash").distinct().orderBy("phash").head().getLong(0)
    val takedown = allImages.where(col("phash") === eAff &&
        unix_timestamp(col("ts")) < b1 &&
        pmod(xxhash64(col("image_id")), lit(2)) === 0)
      .select("image_id")
    SnapshotTable.deleteKeys(spark, corpus, "image_id", takedown) // snapshot 2
    assert(SnapshotIngest.commitOnce(slice(200, 400), corpus, "cam", 1L, Seq("ts")))
    // ONE maintenance call: windows advance AND the takedown heals
    assert(ContinuousFeatures.maintain(spark, corpus, labels, feats, cursor)
      === Some((1L, 3L)))
    assert(Incremental.readLongFile(mark) === Some(3L))
    val b2 = ContinuousFeatures.boundarySec(spark, corpus, 3L, "ts", 600L, 0L)
    val modified = allImages.join(takedown, Seq("image_id"), "left_anti")
    def expected = FeaturePipeline.features(modified, labels)
      .where(unix_timestamp(col("window_start")) < b2)
    assertSameRows(SnapshotTable.read(spark, feats), expected)
    // crash seam: repair landed but the mark write didn't — the replay
    // re-runs the idempotent repair and converges to the same state
    Incremental.writeLongFile(mark, 1L)
    assert(ContinuousFeatures.maintain(spark, corpus, labels, feats, cursor)
      === None, "no new corpus commits — the cycle is idle")
    assert(Incremental.readLongFile(mark) === Some(3L), "mark re-advanced")
    assertSameRows(SnapshotTable.read(spark, feats), expected)
    // idle steady state: nothing to process, nothing to repair
    assert(ContinuousFeatures.maintain(spark, corpus, labels, feats, cursor)
      === None)
    // mark LOST mid-stream (file deleted / migration): the next maintain's
    // own window still heals — only pre-window history is adopted as-is
    java.nio.file.Files.deleteIfExists(mark)
    val takedown2 = allImages.where(col("phash") === eAff &&
        unix_timestamp(col("ts")) < b1 &&
        pmod(xxhash64(col("image_id")), lit(2)) === 1)
      .select("image_id")
    assert(takedown2.count() > 0, "vacuous second takedown")
    SnapshotTable.deleteKeys(spark, corpus, "image_id", takedown2) // snapshot 4
    assert(ContinuousFeatures.maintain(spark, corpus, labels, feats, cursor)
      === Some((3L, 4L)))
    assert(Incremental.readLongFile(mark) === Some(4L))
    val modified2 = modified.join(takedown2, Seq("image_id"), "left_anti")
    assertSameRows(SnapshotTable.read(spark, feats),
      FeaturePipeline.features(modified2, labels)
        .where(unix_timestamp(col("window_start")) < b2))
  }
}
