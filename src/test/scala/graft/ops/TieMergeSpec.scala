package graft.ops

import graft.SparkSpec

class TieMergeSpec extends SparkSpec {
  import spark.implicits._

  test("tieMerge: chains collapse, durations sum, head attrs kept") {
    val df = Seq(
      // (entity, seq, tie, duration, pitch)
      (1L, 1, "start", 1.0, 60),
      (1L, 2, "continue", 0.5, 60),
      (1L, 3, "stop", 0.25, 60),   // chain of 3 -> dur 1.75
      (1L, 4, null, 2.0, 62),      // untied single
      (1L, 5, "start", 1.0, 64),
      (1L, 6, "stop", 1.0, 64),    // chain of 2 -> dur 2.0
      (2L, 1, null, 4.0, 70)
    ).toDF("e", "seq", "tie", "duration", "pitch")

    val out = WindowOps.tieMerge(df, Seq("e"), Seq("seq"), "tie", "duration", Seq("pitch"))
      .orderBy("e", "chain_id")
      .collect().map(r => (r.getAs[Long]("e"), r.getAs[Int]("pitch"),
        r.getAs[Double]("duration"), r.getAs[Long]("chain_len"))).toSeq
    assert(out === Seq(
      (1L, 60, 1.75, 3L),
      (1L, 62, 2.0, 1L),
      (1L, 64, 2.0, 2L),
      (2L, 70, 4.0, 1L)))
  }

  test("reference head rule: '-' sentinel and unknown markers start chains") {
    // set_ties heads on anything that is NOT continue/stop (the tie export
    // writes '-' for untied notes); a '-' row after a stop must NOT merge
    val df = Seq(
      (1L, 1, "start", 1.0, 60),
      (1L, 2, "stop", 0.5, 60),
      (1L, 3, "-", 2.0, 62),        // untied sentinel -> own chain
      (1L, 4, "let-ring", 1.0, 64)  // unknown marker -> own chain
    ).toDF("e", "seq", "tie", "duration", "pitch")
    val out = WindowOps.tieMerge(df, Seq("e"), Seq("seq"), "tie", "duration", Seq("pitch"))
      .orderBy("chain_id")
      .collect().map(r => (r.getAs[Int]("pitch"), r.getAs[Double]("duration"))).toSeq
    assert(out === Seq((60, 1.5), (62, 2.0), (64, 1.0)))
  }

  test("mid-chain slice: leading continue/stop heads defensively, no null attrs") {
    val df = Seq(
      (1L, 1, "continue", 0.5, 61), // sliced input starts mid-chain
      (1L, 2, "stop", 0.25, 61)
    ).toDF("e", "seq", "tie", "duration", "pitch")
    val out = WindowOps.tieMerge(df, Seq("e"), Seq("seq"), "tie", "duration", Seq("pitch"))
      .collect()
    assert(out.length === 1)
    assert(out(0).getAs[Int]("pitch") === 61) // head attrs present, not null
    assert(out(0).getAs[Double]("duration") === 0.75)
    assert(out(0).getAs[Long]("chain_id") === 0L) // 0-based like its siblings
  }
}
