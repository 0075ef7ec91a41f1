package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** The flagship composition as ONE streaming query: as-of label enrichment
  * + tumbling-window feature aggregation, fused into a single custom
  * stateful operator ([[StreamingAsOfFeatures]]) because chaining the
  * as-of stage into a built-in windowed aggregate is unsound (the as-of
  * output is always behind the global watermark, so the downstream
  * aggregate discards every row — Spark's global-watermark correctness
  * check flags exactly this). Parity gate: the fused stream must equal the
  * batch pipeline (AsOfJoin.asOf + window aggregate) window for window on
  * seeded out-of-order data. */
class StreamingFlagshipSpec extends SparkSpec {
  import spark.implicits._
  import StreamingAsOf._

  test("fused streaming as-of+windows == batch as-of -> window agg") {
    val rnd = new scala.util.Random(20260818L)
    val base = ts("2024-01-01 00:00:00").getTime
    val rows = (0 until 400).map { i =>
      val entity = rnd.nextInt(10).toLong
      val t = new Timestamp(base + rnd.nextInt(7200) * 1000L)
      if (rnd.nextInt(10) < 3)
        In(entity, t, isLabel = true, "", s"L${i % 5}", rnd.nextInt(100).toDouble)
      else In(entity, t, isLabel = false, s"e$i", "", 0.0)
    }
      .groupBy(r => (r.entity, r.ts.getTime, r.isLabel)).map(_._2.head).toSeq

    // batch reference: union+window as-of, then the same tumbling aggregate
    val probes = rows.filterNot(_.isLabel)
      .map(r => (r.entity, r.ts, r.eventId)).toDF("entity", "ts", "event_id")
    val labels = rows.filter(_.isLabel)
      .map(r => (r.entity, r.ts, r.label, r.weight))
      .toDF("entity", "label_ts", "label", "weight")
    val expected = graft.ops.AsOfJoin.asOf(probes, labels,
        "entity", "ts", "label_ts", Seq("label", "weight"))
      .groupBy(col("entity"), window(col("ts"), "15 minutes"))
      .agg(count(lit(1)).as("n_events"),
        count(col("label")).as("n_labeled"),
        sum(col("weight")).as("w_sum"))
      .select(col("entity"), col("window.start"),
        col("n_events"), col("n_labeled"), col("w_sum"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getLong(3), Option(r.get(4)))).toSet

    implicit val ctx = spark.sqlContext
    val in = MemoryStream[In]
    val q = StreamingAsOfFeatures.asOfWindowedStream(in.toDS(),
        windowSize = "15 minutes", watermark = "10 minutes")
      .writeStream.format("memory").queryName("flagship_stream")
      .outputMode("append").start()
    try {
      rows.sortBy(_.ts.getTime).grouped(60).foreach { chunk =>
        in.addData(rnd.shuffle(chunk): _*)
        q.processAllAvailable()
      }
      // drain: two far-future pushes (the second fires event-time timeouts
      // for groups the first push's row doesn't touch)
      Seq(100L, 101L).zipWithIndex.foreach { case (h, i) =>
        in.addData(In(990L + i, new Timestamp(base + h * 3600 * 1000), false, s"f$i", "", 0.0))
        q.processAllAvailable()
      }
      val got = spark.table("flagship_stream")
        .where(col("entity") < 990L)
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
          r.getLong(3), Option(r.get(4)))).toSet
      assert(got === expected,
        s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    } finally q.stop()
  }

  test("windows emit once complete — incremental, not only at shutdown") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[In]
    val q = StreamingAsOfFeatures.asOfWindowedStream(in.toDS(),
        windowSize = "15 minutes", watermark = "5 minutes")
      .writeStream.format("memory").queryName("flagship_inc")
      .outputMode("append").start()
    try {
      in.addData(
        In(1L, ts("2024-01-01 00:01:00"), isLabel = true, "", "A", 2.0),
        In(1L, ts("2024-01-01 00:02:00"), isLabel = false, "e1", "", 0.0),
        In(1L, ts("2024-01-01 00:05:00"), isLabel = false, "e2", "", 0.0))
      q.processAllAvailable()
      // watermark reaches 00:25 > window [00:00, 00:15) end -> emits now
      in.addData(In(1L, ts("2024-01-01 00:30:00"), isLabel = false, "e3", "", 0.0))
      q.processAllAvailable()
      in.addData(In(1L, ts("2024-01-01 00:40:00"), isLabel = false, "e4", "", 0.0))
      q.processAllAvailable()
      val got = spark.table("flagship_inc")
        .collect().map(r => (r.getTimestamp(1).toString, r.getLong(2),
          r.getLong(3), Option(r.get(4))))
      assert(got.toSeq === Seq(("2024-01-01 00:00:00.0", 2L, 2L, Some(4.0))),
        s"got ${got.toSeq}")
    } finally q.stop()
  }
}
