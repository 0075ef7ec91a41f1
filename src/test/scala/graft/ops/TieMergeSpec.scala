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
}
