package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Streaming as-of (flatMapGroupsWithState custom state) must reproduce the
  * batch as-of semantics — latest label at-or-before, label-at-same-ts
  * applies, no-label probes emit None — including for rows delivered OUT OF
  * ORDER within the watermark horizon. */
class StreamingAsOfSpec extends SparkSpec {
  import spark.implicits._
  import StreamingAsOf._

  private def probe(e: Long, t: String, id: String) =
    In(e, ts(t), isLabel = false, id, "", 0.0)
  private def label(e: Long, t: String, l: String, w: Double) =
    In(e, ts(t), isLabel = true, "", l, w)

  test("streaming as-of == batch semantics, out-of-order within the watermark") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[In]
    val q = asOfStream(in.toDS(), watermark = "5 minutes")
      .writeStream.format("memory").queryName("asof").outputMode("append").start()
    try {
      // batch 1: OUT OF ORDER — the probe arrives before its label, both
      // inside the watermark horizon; correct output still pairs e2 with B
      in.addData(
        probe(1L, "2024-01-01 00:20:00", "e2"),
        label(1L, "2024-01-01 00:15:00", "B", 2.0),
        label(1L, "2024-01-01 00:00:00", "A", 1.0),
        probe(1L, "2024-01-01 00:10:00", "e1"),
        probe(2L, "2024-01-01 00:01:00", "e3")) // entity 2: no label at all
      q.processAllAvailable()
      // batch 2: advance the watermark far past every buffered row so the
      // state drains (this row itself stays buffered)
      in.addData(probe(1L, "2024-01-01 02:00:00", "e9"))
      q.processAllAvailable()
      // one more watermark push so entity 2's buffered probe (no new data
      // for that group) drains via the event-time timeout
      in.addData(probe(3L, "2024-01-01 03:00:00", "e10"))
      q.processAllAvailable()

      val got = spark.table("asof")
        .collect().map(r => (r.getAs[String]("eventId"),
          Option(r.getAs[String]("label")), Option(r.getAs[Any]("weight")))).toSet
      assert(got.contains(("e1", Some("A"), Some(1.0))), s"got $got")
      assert(got.contains(("e2", Some("B"), Some(2.0))), s"got $got")
      assert(got.contains(("e3", None, None)), s"got $got")
    } finally q.stop()
  }

  test("label at the probe's exact ts applies (the <= bound)") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[In]
    val q = asOfStream(in.toDS(), watermark = "1 minute")
      .writeStream.format("memory").queryName("asof_tie").outputMode("append").start()
    try {
      in.addData(
        probe(1L, "2024-01-01 00:10:00", "tie"),
        label(1L, "2024-01-01 00:10:00", "X", 9.0))
      q.processAllAvailable()
      in.addData(probe(2L, "2024-01-01 01:00:00", "flush"))
      q.processAllAvailable()
      in.addData(probe(3L, "2024-01-01 02:00:00", "flush2"))
      q.processAllAvailable()
      val got = spark.table("asof_tie").where("eventId = 'tie'")
        .collect().map(r => Option(r.getAs[String]("label"))).toSeq
      assert(got === Seq(Some("X")))
    } finally q.stop()
  }
}
