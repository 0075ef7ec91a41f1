package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.Row
import java.nio.file.Files
import java.sql.Timestamp

/** Streaming resumability (north rule: "resumable from checkpoint"):
  * a killed streaming flagship query restarted from its checkpoint
  * recovers its window state — events buffered BEFORE the restart
  * aggregate correctly with events arriving after it, and the closed
  * window emits exactly once. (foreachBatch sink: the memory sink does
  * not support checkpoint recovery in append mode.) */
class StreamingResumeSpec extends SparkSpec {
  import spark.implicits._

  test("windowed aggregation state survives a stop/restart from checkpoint") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Double)]
    val out = StreamingFeatures.windowedFeatures(
      in.toDF.toDF("phash", "ts", "value"), watermark = "5 minutes")
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString
    val got = scala.collection.mutable.ArrayBuffer.empty[Row]
    def start() = out.writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = df.collect()
        got.synchronized { got ++= rows }
        ()
      }
      .start()

    // phase 1: two events land in the 00:00 window; nothing emits yet
    // (watermark hasn't passed the window end) — then the query "dies"
    val q1 = start()
    try {
      in.addData(
        (1L, ts("2024-01-01 00:01:00"), 2.0),
        (1L, ts("2024-01-01 00:07:00"), 3.0))
      q1.processAllAvailable()
      assert(got.synchronized(got.isEmpty), "window closed prematurely")
    } finally q1.stop()

    // phase 2: a NEW query from the same checkpoint; an event far past the
    // window advances the watermark — the recovered state must emit the
    // 00:00 window with BOTH pre-restart events, exactly once
    val q2 = start()
    try {
      in.addData((1L, ts("2024-01-01 01:00:00"), 9.0))
      q2.processAllAvailable()
      in.addData((1L, ts("2024-01-01 02:00:00"), 5.0)) // close the 01:00 window
      q2.processAllAvailable()
      val rows = got.synchronized(got.toList)
        .sortBy(_.getAs[Timestamp]("window_start").getTime)
      assert(rows.map(_.getAs[Timestamp]("window_start")).distinct.size
        === rows.size, s"duplicate window emissions: $rows")
      val w0 = rows.head
      assert(w0.getAs[Timestamp]("window_start") === ts("2024-01-01 00:00:00"))
      assert(w0.getAs[Long]("n_events") === 2L,
        s"pre-restart state lost: $w0")
      assert(w0.getAs[Double]("value_mean") === 2.5)
    } finally q2.stop()
  }
}
