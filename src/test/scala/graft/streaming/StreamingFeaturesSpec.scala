package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Structured-Streaming semantics: watermarked tumbling windows finalize and
  * drop late rows; session windows merge by gap; batch == stream on in-order
  * input (the parity the design promises). */
class StreamingFeaturesSpec extends SparkSpec {
  import spark.implicits._

  private def ev(e: Long, t: String, v: Double): (Long, Timestamp, Double) =
    (e, ts(t), v)

  test("tumbling windows emit on watermark passage; late rows are dropped") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Double)]
    val out = StreamingFeatures.windowedFeatures(
      in.toDF.toDF("phash", "ts", "value"), watermark = "5 minutes")
    val q = out.writeStream.format("memory").queryName("tumbling")
      .outputMode("append").start()
    try {
      in.addData(
        ev(1L, "2024-01-01 00:01:00", 1.0),
        ev(1L, "2024-01-01 00:04:00", 3.0))
      q.processAllAvailable()
      // advance event time far past the first window + watermark -> finalize
      in.addData(ev(1L, "2024-01-01 01:00:00", 9.0))
      q.processAllAvailable()
      // a LATE row for the already-closed first window: must be dropped
      in.addData(ev(1L, "2024-01-01 00:02:00", 100.0))
      in.addData(ev(1L, "2024-01-01 02:00:00", 5.0)) // close the 01:00 window
      q.processAllAvailable()

      val rows = spark.table("tumbling")
        .orderBy("window_start").collect()
      assert(rows.length === 2)
      val w0 = rows(0)
      assert(w0.getAs[Timestamp]("window_start") === ts("2024-01-01 00:00:00"))
      assert(w0.getAs[Long]("n_events") === 2L)      // late 100.0 row dropped
      assert(w0.getAs[Double]("value_mean") === 2.0) // (1+3)/2, untainted
      assert(rows(1).getAs[Long]("n_events") === 1L)
    } finally q.stop()
  }

  test("session windows merge events within the gap") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Double)]
    val out = StreamingFeatures.sessionFeatures(
      in.toDF.toDF("phash", "ts", "value"), watermark = "1 minute", gap = "10 minutes")
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      in.addData(
        ev(7L, "2024-01-01 00:00:00", 1.0),
        ev(7L, "2024-01-01 00:05:00", 2.0),  // same session (gap 5m < 10m)
        ev(7L, "2024-01-01 00:30:00", 4.0))  // new session (gap 25m)
      q.processAllAvailable()
      in.addData(ev(7L, "2024-01-01 09:00:00", 0.0)) // advance watermark
      q.processAllAvailable()
      val rows = spark.table("sessions").orderBy("session_start").collect()
      assert(rows.length >= 2)
      assert(rows(0).getAs[Long]("n_events") === 2L)
      assert(rows(0).getAs[Double]("value_sum") === 3.0)
      assert(rows(1).getAs[Long]("n_events") === 1L)
    } finally q.stop()
  }

  test("batch/stream parity: same aggregation on a static frame") {
    val static = Seq(
      ev(1L, "2024-01-01 00:01:00", 1.0),
      ev(1L, "2024-01-01 00:04:00", 3.0),
      ev(1L, "2024-01-01 00:12:00", 5.0)
    ).toDF("phash", "ts", "value")
    val got = StreamingFeatures.windowedFeatures(static)
      .orderBy("window_start")
      .select("n_events", "value_mean").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === Seq((2L, 2.0), (1L, 5.0)))
  }

  test("sliding windows: hop = size - overlap, each event in size/hop windows") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Double)]
    // size 10m, overlap 5m -> hop 5m: an event at 00:07 lands in the
    // [00:00,00:10) and [00:05,00:15) windows
    val out = StreamingFeatures.slidingFeatures(
      in.toDF.toDF("phash", "ts", "value"), watermark = "5 minutes",
      windowDur = "10 minutes", overlapDur = "5 minutes")
    val q = out.writeStream.format("memory").queryName("sliding")
      .outputMode("append").start()
    try {
      in.addData(ev(1L, "2024-01-01 00:07:00", 4.0))
      q.processAllAvailable()
      in.addData(ev(1L, "2024-01-01 01:00:00", 9.0)) // close both via watermark
      q.processAllAvailable()
      val starts = spark.table("sliding")
        .where(col("value_mean") === 4.0)
        .orderBy("window_start").collect()
        .map(_.getAs[Timestamp]("window_start")).toSeq
      assert(starts === Seq(ts("2024-01-01 00:00:00"), ts("2024-01-01 00:05:00")))
    } finally q.stop()
  }

  test("sliding batch/stream parity and musif overlap convention") {
    val static = Seq(
      ev(1L, "2024-01-01 00:01:00", 1.0),
      ev(1L, "2024-01-01 00:07:00", 3.0),
      ev(1L, "2024-01-01 00:12:00", 5.0)
    ).toDF("phash", "ts", "value")
    val got = StreamingFeatures.slidingFeatures(static,
      windowDur = "10 minutes", overlapDur = "5 minutes")
      .orderBy("window_start")
      .select("window_start", "n_events", "value_mean").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2))).toSeq
    // windows: [-0:05,0:05) {1}, [0:00,0:10) {1,3}, [0:05,0:15) {3,5}, [0:10,0:20) {5}
    assert(got === Seq(
      (ts("2023-12-31 23:55:00"), 1L, 1.0),
      (ts("2024-01-01 00:00:00"), 2L, 2.0),
      (ts("2024-01-01 00:05:00"), 2L, 4.0),
      (ts("2024-01-01 00:10:00"), 1L, 5.0)))
    // zero overlap degenerates to tumbling
    val tumb = StreamingFeatures.slidingFeatures(static,
      windowDur = "10 minutes", overlapDur = "0 minutes")
      .select("window_start", "n_events").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1))).toSet
    val ref = StreamingFeatures.windowedFeatures(static)
      .select("window_start", "n_events").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1))).toSet
    assert(tumb === ref)
    // size must exceed overlap
    intercept[IllegalArgumentException] {
      StreamingFeatures.slidingFeatures(static,
        windowDur = "10 minutes", overlapDur = "10 minutes")
    }
  }

  test("streaming exact dedup drops within-watermark duplicates, keeps distinct content") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val out = StreamingFeatures.dedupStream(
      in.toDF.toDF("doc_id", "ts", "caption"),
      contentCol = "caption", watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      in.addData(
        (1L, ts("2024-01-01 00:01:00"), "alpha beta"),
        (2L, ts("2024-01-01 00:02:00"), " Alpha   BETA "), // same normalized fp
        (3L, ts("2024-01-01 00:03:00"), "gamma delta"))
      q.processAllAvailable()
      in.addData((4L, ts("2024-01-01 00:05:00"), "alpha beta")) // dup again
      q.processAllAvailable()
      val ids = spark.table("dedup").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(ids === Set(1L, 3L), s"got $ids")
    } finally q.stop()
  }

  test("streaming perceptual dedup keys on aHash: re-encoded copies drop") {
    import graft.functions.ImageCodec
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Array[Byte])]
    val out = StreamingFeatures.dedupImagesStream(
      in.toDF.toDF("img", "ts", "bytes"), watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("imgdedup")
      .outputMode("append").start()
    try {
      // find content whose lossy re-encode preserves the average-hash
      // (quantization flips mean-borderline bits with p ~ 0.03/bit, so a
      // hash-preserving seed exists in any small range — deterministic)
      val seed = (0L until 200L).find { s =>
        ImageCodec.aHash64(ImageCodec.encode(s, 16, 16, lossy = false)) ==
          ImageCodec.aHash64(ImageCodec.encode(s, 16, 16, lossy = true))
      }.getOrElse(fail("no hash-preserving seed in range"))
      val lossless = ImageCodec.encode(seed, 16, 16, lossy = false)
      val lossy = ImageCodec.encode(seed, 16, 16, lossy = true)
      // DIFFERENT bytes, same 8x8 average-hash — perceptual dedup drops
      // the re-encode, byte-fingerprint dedup would not
      assert(!java.util.Arrays.equals(lossless, lossy))
      val other = ImageCodec.encode(99L, 16, 16, lossy = false)
      // corrupt payloads (all hash 0) must BYPASS the dedup state — two
      // distinct broken rows both survive for the error channel
      val corruptA = Array[Byte](1, 2, 3)
      val corruptB = lossless.take(5)
      in.addData(
        (1L, ts("2024-01-01 00:01:00"), lossless),
        (2L, ts("2024-01-01 00:02:00"), lossy),
        (3L, ts("2024-01-01 00:03:00"), other),
        (4L, ts("2024-01-01 00:03:30"), corruptA),
        (5L, ts("2024-01-01 00:04:00"), corruptB))
      q.processAllAvailable()
      val ids = spark.table("imgdedup").select("img")
        .collect().map(_.getLong(0)).toSet
      assert(ids === Set(1L, 3L, 4L, 5L), s"got $ids")
    } finally q.stop()
  }
}
