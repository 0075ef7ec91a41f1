package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WindowOpsSpec extends SparkSpec {
  import spark.implicits._

  test("backfill: bounded-preceding last non-null, null head preserved") {
    val df = Seq(
      (1L, 1, None: Option[Double]),
      (1L, 2, Some(5.0)),
      (1L, 3, None),
      (1L, 4, None),
      (1L, 5, Some(7.0)),
      (2L, 1, None) // partition head stays null
    ).toDF("e", "seq", "v")
    val got = WindowOps.backfill(df, Seq("e"), Seq("seq"), Seq("v"))
      .orderBy("e", "seq").select("v_filled").collect().map(r => Option(r.get(0))).toSeq
    assert(got === Seq(None, Some(5.0), Some(5.0), Some(5.0), Some(7.0), None))
  }

  test("sessionize: gap strictly greater than gapSeconds starts a session") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00")),
      (1L, ts("2024-01-01 00:30:00")), // exactly 1800s -> SAME session
      (1L, ts("2024-01-01 01:00:01")), // 1801s -> NEW session
      (2L, ts("2024-01-01 09:00:00"))  // new entity -> session 0
    ).toDF("e", "ts")
    val got = WindowOps.sessionize(df, Seq("e"), "ts", 1800L)
      .orderBy("e", "ts").select("session_id").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(0L, 0L, 1L, 0L))
  }

  test("runLength: change starts segment; compressRuns keeps run heads") {
    val df = Seq(
      (1L, 1, "a"), (1L, 2, "a"), (1L, 3, "b"), (1L, 4, "a"), (1L, 5, "a")
    ).toDF("e", "seq", "v")
    val segs = WindowOps.runLength(df, Seq("e"), Seq("seq"), "v")
      .orderBy("seq").select("segment_id").collect().map(_.getLong(0)).toSeq
    assert(segs === Seq(0L, 0L, 1L, 2L, 2L))
    val heads = WindowOps.compressRuns(df, Seq("e"), Seq("seq"), "v")
      .orderBy("seq").select("seq").collect().map(_.getInt(0)).toSeq
    assert(heads === Seq(1, 3, 4))
  }

  test("slidingWindowIds: size 4 / overlap 2 membership matches hand calc") {
    val df = (0L to 5L).toDF("seq")
    val got = WindowOps.slidingWindowIds(df, "seq", size = 4, overlap = 2)
      .groupBy("seq").agg(sort_array(collect_list(col("window_id"))).as("ws"))
      .orderBy("seq").collect().map(_.getSeq[Long](1).toSeq).toSeq
    assert(got === Seq(
      Seq(0L), Seq(0L), Seq(0L, 1L), Seq(0L, 1L), Seq(1L, 2L), Seq(1L, 2L)))
  }

  test("compressRuns: null is a run value, not a dropped row") {
    val df = Seq(
      (1L, 1, Some("a")), (1L, 2, None: Option[String]), (1L, 3, None), (1L, 4, Some("b"))
    ).toDF("e", "seq", "v")
    val got = WindowOps.compressRuns(df, Seq("e"), Seq("seq"), "v")
      .orderBy("seq").select("seq").collect().map(_.getInt(0)).toSeq
    assert(got === Seq(1, 2, 4)) // null run compressed to its head, not lost
    // null-headed entity keeps its head row
    val df2 = Seq((2L, 1, None: Option[String])).toDF("e", "seq", "v")
    assert(WindowOps.compressRuns(df2, Seq("e"), Seq("seq"), "v").count() === 1L)
  }

  test("rollingMean: centered +-1 window") {
    val df = Seq((1L, 1, 1.0), (1L, 2, 2.0), (1L, 3, 6.0)).toDF("e", "seq", "v")
    val got = WindowOps.rollingMean(df, Seq("e"), Seq("seq"), "v", 1, "m")
      .orderBy("seq").select("m").collect().map(_.getDouble(0)).toSeq
    assert(got === Seq(1.5, 3.0, 4.0))
  }

  test("diffChain: speed then acceleration") {
    val df = Seq((1L, 1, 1.0), (1L, 2, 3.0), (1L, 3, 7.0)).toDF("e", "seq", "v")
    val got = WindowOps.diffChain(df, Seq("e"), Seq("seq"), "v")
      .orderBy("seq").select("speed", "accel")
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)))).toSeq
    assert(got === Seq((None, None), (Some(2.0), None), (Some(4.0), Some(2.0))))
  }
}
