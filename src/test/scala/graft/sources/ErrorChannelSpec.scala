package graft.sources

import graft.SparkSpec
import graft.functions.ImageCodec
import org.apache.spark.sql.functions._

class ErrorChannelSpec extends SparkSpec {
  import spark.implicits._

  private def rows = Seq(
    ("ok", ImageCodec.encode(1L, 4, 4, lossy = false), 4, 4, "png", "fine caption",
      Some(ts("2024-01-01 00:00:00"))),
    ("bad_len", ImageCodec.encode(1L, 3, 3, lossy = false), 4, 4, "png", "caption",
      Some(ts("2024-01-01 00:00:00"))),
    ("bad_fmt", ImageCodec.encode(1L, 4, 4, lossy = false), 4, 4, "bmp", "caption",
      Some(ts("2024-01-01 00:00:00"))),
    ("bad_multi", null: Array[Byte], 0, 4, "bmp", "",
      None: Option[java.sql.Timestamp])
  ).toDF("image_id", "bytes", "w", "h", "fmt", "caption", "ts")

  test("split: good rows clean, error rows carry failed check names") {
    val (good, bad) = ErrorChannel.split(rows, ErrorChannel.imageChecks)
    assert(good.select("image_id").collect().map(_.getString(0)).toSeq === Seq("ok"))
    assert(!good.columns.contains("__errors"))
    val reasons = bad.select("image_id", "error_reasons").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(reasons("bad_len") === "bytes_length")
    assert(reasons("bad_fmt") === "fmt_known")
    val multi = reasons("bad_multi").split(";").toSet
    assert(Set("bytes_present", "dims_positive", "fmt_known",
      "caption_present", "ts_present").subsetOf(multi))
  }

  test("validate is a single narrow pass (no join/shuffle in plan)") {
    val plan = ErrorChannel.validate(rows, ErrorChannel.imageChecks)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"), plan)
  }

  test("audio checks: header/metadata length contract, sr domain") {
    import graft.functions.AudioCodec
    val rows = Seq(
      ("ok", AudioCodec.encode(1L, 8000, 64, lossy = false), 8000, 64, "wav"),
      ("bad_len", AudioCodec.encode(1L, 8000, 32, lossy = false), 8000, 64, "wav"),
      ("bad_sr", AudioCodec.encode(1L, 123, 64, lossy = false), 123, 64, "wav"),
      ("bad_multi", null: Array[Byte], 8000, 0, "ogg")
    ).toDF("clip_id", "samples", "sr", "n", "fmt")
    val (good, bad) = ErrorChannel.split(rows, ErrorChannel.audioChecks)
    assert(good.select("clip_id").collect().map(_.getString(0)).toSeq === Seq("ok"))
    val reasons = bad.select("clip_id", "error_reasons").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(reasons("bad_len") === "samples_length")
    assert(reasons("bad_sr") === "sr_known")
    assert(Set("samples_present", "n_positive", "fmt_known")
      .subsetOf(reasons("bad_multi").split(";").toSet))
  }

  test("video checks: container length contract") {
    import graft.functions.VideoCodec
    val rows = Seq(
      ("ok", VideoCodec.encode(1L, 3, 4, 4), 3, 4, 4, "gv"),
      ("bad_len", VideoCodec.encode(1L, 2, 4, 4), 3, 4, 4, "gv"),
      ("bad_multi", null: Array[Byte], 0, 4, 4, "avi")
    ).toDF("clip_id", "video", "n_frames", "w", "h", "fmt")
    val (good, bad) = ErrorChannel.split(rows, ErrorChannel.videoChecks)
    assert(good.select("clip_id").collect().map(_.getString(0)).toSeq === Seq("ok"))
    val reasons = bad.select("clip_id", "error_reasons").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(reasons("bad_len") === "video_length")
    assert(Set("video_present", "dims_positive", "fmt_known")
      .subsetOf(reasons("bad_multi").split(";").toSet))
  }
}
