package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming lag must reproduce the batch
  * `lag(value) over (partitionBy entity orderBy ts, eventId)` semantics —
  * previous in-order value + delta, None at the entity head — including for
  * rows delivered out of order within the watermark horizon. */
class StreamingLagSpec extends SparkSpec {
  import spark.implicits._
  import StreamingLag._

  test("randomized parity: streaming lag == batch lag window") {
    implicit val ctx = spark.sqlContext
    val rnd = new scala.util.Random(20260818L)
    val base = ts("2024-01-01 00:00:00").getTime
    val rows = (0 until 300).map { i =>
      In(rnd.nextInt(8).toLong,
        new java.sql.Timestamp(base + i * 60000L + rnd.nextInt(30) * 1000L),
        f"e$i%04d", rnd.nextInt(100).toDouble)
    }
    val batches = rows.grouped(60).map(b => rnd.shuffle(b)).toList

    val in = MemoryStream[In]
    val q = lagStream(in.toDS(), watermark = "2 minutes")
      .writeStream.format("memory").queryName("lagp").outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      in.addData(In(99L, ts("2024-02-01 00:00:00"), "zz1", 0.0))
      q.processAllAvailable()
      in.addData(In(98L, ts("2024-03-01 00:00:00"), "zz2", 0.0))
      q.processAllAvailable()

      val streamed = spark.table("lagp")
        .where(!col("eventId").startsWith("zz"))
        .select("entity", "eventId", "prevValue", "delta")
        .collect().map(r => (r.getLong(0), r.getString(1),
          Option(r.getAs[Any](2)), Option(r.getAs[Any](3)))).toSet

      val w = Window.partitionBy(col("entity")).orderBy(col("ts"), col("eventId"))
      val batch = rows.toDF("entity", "ts", "eventId", "value")
        .withColumn("prevValue", lag(col("value"), 1).over(w))
        .withColumn("delta", col("value") - col("prevValue"))
        .select("entity", "eventId", "prevValue", "delta")
        .collect().map(r => (r.getLong(0), r.getString(1),
          Option(r.getAs[Any](2)), Option(r.getAs[Any](3)))).toSet

      assert(streamed === batch,
        s"diff: ${(streamed diff batch) ++ (batch diff streamed)}")
    } finally q.stop()
  }
}
