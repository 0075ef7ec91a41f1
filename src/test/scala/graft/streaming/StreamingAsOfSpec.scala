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

  test("randomized parity: streaming as-of == batch as-of on seeded data") {
    // deterministic pseudo-random corpus; batches are ts-chunked (so no row
    // is ever late past the watermark) but SHUFFLED WITHIN each batch — the
    // buffer/sort logic does the reordering work
    val rnd = new scala.util.Random(20240817L)
    val base = ts("2024-01-01 00:00:00").getTime
    val rows = (0 until 400).map { i =>
      val entity = rnd.nextInt(12).toLong
      val t = new Timestamp(base + rnd.nextInt(7200) * 1000L)
      if (rnd.nextInt(10) < 3)
        In(entity, t, isLabel = true, "", s"L$i", rnd.nextInt(100).toDouble)
      else In(entity, t, isLabel = false, s"e$i", "", 0.0)
    }
      // unique (entity, ts, isLabel): ties between two labels at one ts are
      // resolved by arrival in streaming but by max() in batch — exclude
      .groupBy(r => (r.entity, r.ts.getTime, r.isLabel)).map(_._2.head).toSeq

    // batch reference: the union+window formulation over the same rows
    val probes = rows.filterNot(_.isLabel)
      .map(r => (r.entity, r.ts, r.eventId)).toDF("entity", "ts", "event_id")
    val labels = rows.filter(_.isLabel)
      .map(r => (r.entity, r.ts, r.label, r.weight))
      .toDF("entity", "label_ts", "label", "weight")
    val expected = graft.ops.AsOfJoin.asOf(probes, labels,
        "entity", "ts", "label_ts", Seq("label", "weight"))
      .collect().map(r => (r.getAs[String]("event_id"),
        Option(r.getAs[String]("label")),
        Option(r.getAs[Any]("weight")))).toSet

    implicit val ctx = spark.sqlContext
    val in = MemoryStream[In]
    val q = asOfStream(in.toDS(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("asof_prop").outputMode("append").start()
    try {
      rows.sortBy(_.ts.getTime).grouped(60).foreach { chunk =>
        in.addData(rnd.shuffle(chunk): _*)
        q.processAllAvailable()
      }
      // flush: push the watermark far past everything, twice (second push
      // fires event-time timeouts for groups the flush row doesn't touch)
      in.addData(In(990L, new Timestamp(base + 100L * 3600 * 1000), false, "f1", "", 0.0))
      q.processAllAvailable()
      in.addData(In(991L, new Timestamp(base + 101L * 3600 * 1000), false, "f2", "", 0.0))
      q.processAllAvailable()

      val got = spark.table("asof_prop")
        .where("eventId NOT IN ('f1', 'f2')")
        .collect().map(r => (r.getAs[String]("eventId"),
          Option(r.getAs[String]("label")),
          Option(r.getAs[Any]("weight")))).toSet
      assert(got === expected,
        s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
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
