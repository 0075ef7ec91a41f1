package graft.streaming

import graft.SparkSpec
import graft.ops.WindowOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming backfill (flatMapGroupsWithState custom state) must reproduce
  * the batch `WindowOps.backfill` semantics — a non-null row fills itself
  * and every later null until the next non-null, per entity, (ts, eventId)
  * ordered — including for rows delivered out of order within the
  * watermark horizon. */
class StreamingBackfillSpec extends SparkSpec {
  import spark.implicits._
  import StreamingBackfill._

  test("out-of-order nulls fill from the latest preceding non-null") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[In]
    val q = backfillStream(in.toDS(), watermark = "5 minutes")
      .writeStream.format("memory").queryName("bf").outputMode("append").start()
    try {
      // delivered out of order: the null at 00:10 must fill from 00:05's
      // 2.0, not from 00:00's 1.0, once the buffer reorders
      in.addData(
        In(1L, ts("2024-01-01 00:10:00"), "e3", None),
        In(1L, ts("2024-01-01 00:00:00"), "e1", Some(1.0)),
        In(1L, ts("2024-01-01 00:05:00"), "e2", Some(2.0)),
        In(2L, ts("2024-01-01 00:01:00"), "e4", None)) // entity 2: nothing to fill from
      // two extra watermark pushes drain the buffered + timed-out groups
      in.addData(In(1L, ts("2024-01-01 02:00:00"), "e9", None))
      in.addData(In(3L, ts("2024-01-01 03:00:00"), "e10", None))
      q.processAllAvailable()

      val got = spark.table("bf").collect()
        .map(r => (r.getAs[String]("eventId"), Option(r.getAs[Any]("valueFilled"))))
        .toMap
      assert(got("e1") === Some(1.0))
      assert(got("e2") === Some(2.0))
      assert(got("e3") === Some(2.0), s"out-of-order fill broken: $got")
      assert(got("e4") === None)
    } finally q.stop()
  }

  test("randomized parity: streaming backfill == batch backfill") {
    implicit val ctx = spark.sqlContext
    val rnd = new scala.util.Random(20260817L)
    val base = ts("2024-01-01 00:00:00").getTime
    val rows = (0 until 300).map { i =>
      In(rnd.nextInt(8).toLong,
        new java.sql.Timestamp(base + i * 60000L + rnd.nextInt(30) * 1000L),
        f"e$i%04d",
        if (rnd.nextInt(3) == 0) Some(rnd.nextInt(100).toDouble) else None)
    }
    // ts-chunked batches (nothing arrives later than the watermark allows)
    // but shuffled WITHIN each batch — the buffer does the reordering
    val batches = rows.grouped(60).map(b => rnd.shuffle(b)).toList

    val in = MemoryStream[In]
    val q = backfillStream(in.toDS(), watermark = "2 minutes")
      .writeStream.format("memory").queryName("bfp").outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      // drain: push the watermark far past everything, twice (event-time
      // timeouts for untouched groups fire on the SECOND push)
      in.addData(In(99L, ts("2024-02-01 00:00:00"), "zz1", None))
      q.processAllAvailable()
      in.addData(In(98L, ts("2024-03-01 00:00:00"), "zz2", None))
      q.processAllAvailable()

      val streamed = spark.table("bfp")
        .where(!col("eventId").startsWith("zz"))
        .select("entity", "eventId", "valueFilled")
        .collect().map(r => (r.getLong(0), r.getString(1),
          Option(r.getAs[Any](2)))).toSet

      val batch = WindowOps.backfill(
          rows.toDF("entity", "ts", "eventId", "value"),
          Seq("entity"), Seq("ts", "eventId"), Seq("value"))
        .select("entity", "eventId", "value_filled")
        .collect().map(r => (r.getLong(0), r.getString(1),
          Option(r.getAs[Any](2)))).toSet

      assert(streamed === batch,
        s"diff: ${(streamed diff batch) ++ (batch diff streamed)}")
    } finally q.stop()
  }
}
