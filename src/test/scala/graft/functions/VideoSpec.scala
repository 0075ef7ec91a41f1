package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Video container codec + Catalyst expressions: header/extract round-trip,
  * stride sampling, composition with the image expressions, totality on
  * corrupt payloads, codegen span. */
class VideoSpec extends SparkSpec {

  test("roundtrip: header fields; extracted frame == image payload of stored pixels") {
    val b = VideoCodec.encode(42L, 5, 6, 4)
    assert(VideoCodec.frameCount(b) === 5)
    assert(VideoCodec.width(b) === 6 && VideoCodec.height(b) === 4)
    for (f <- 0 until 5) {
      val img = VideoCodec.extractFrame(b, f)
      assert(ImageCodec.width(img) === 6 && ImageCodec.height(img) === 4)
      val px = ImageCodec.decode(img)
      val fseed = ImageCodec.mix64(42L ^ (f * 0x9e3779b97f4a7c15L))
      for (y <- 0 until 4; x <- 0 until 6)
        assert(px(y * 6 + x) === ImageCodec.pixelAt(fseed, x, y, 6, 4), s"frame $f")
    }
    // frames differ (per-frame seed)
    assert(!VideoCodec.extractFrame(b, 0).sameElements(VideoCodec.extractFrame(b, 1)))
  }

  test("sampleFrames: stride picks 0, s, 2s, ...; totality on corrupt input") {
    val b = VideoCodec.encode(7L, 8, 5, 5)
    val s3 = VideoCodec.sampleFrames(b, 3)
    assert(s3.length === 3) // frames 0, 3, 6
    assert(s3(1).toSeq === VideoCodec.extractFrame(b, 3).toSeq)
    assert(VideoCodec.sampleFrames(b, 1).length === 8)
    assert(VideoCodec.extractFrame(b, 8).isEmpty) // out of range
    assert(VideoCodec.extractFrame(b, -1).isEmpty)
    assert(VideoCodec.frameCount(Array[Byte](1, 2)) === 0)
    assert(VideoCodec.sampleFrames(Array.empty[Byte], 3).isEmpty)
  }

  test("catalyst expressions compose with image expressions and stay codegen'd") {
    val enc = udf { (id: Long) => VideoCodec.encode(id, 4, 6, 6) }
    val q = spark.range(1, 30)
      .withColumn("video", enc(col("id")))
      .select(col("id"), col("video"),
        VideoFunctions.frame_count(col("video")).as("nf"),
        posexplode(VideoFunctions.sample_frames(col("video"), lit(2)))
          .as(Seq("pos", "frame")))
      .select(col("id"), col("nf"), col("pos"),
        length(col("frame")).as("fl"),
        ImageFunctions.mean_brightness(col("frame")).as("mb"),
        ImageFunctions.psnr(col("frame"),
          VideoFunctions.extract_frame(col("video"), col("pos") * 2)).as("p"))
    val rows = q.collect()
    assert(rows.length === 29 * 2) // 4 frames, stride 2 -> frames 0 and 2
    rows.foreach { r =>
      val bytes = VideoCodec.encode(r.getAs[Long]("id"), 4, 6, 6)
      val frame = VideoCodec.extractFrame(bytes, r.getAs[Int]("pos") * 2)
      assert(r.getAs[Int]("nf") === 4)
      assert(r.getAs[Int]("fl") === ImageCodec.HeaderLen + 36)
      assert(math.abs(r.getAs[Double]("mb") - ImageCodec.meanBrightness(frame)) < 1e-12)
      assert(r.getAs[Double]("p") === 99.0) // identical payloads
    }
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"video expressions fell out of codegen:\n$plan")
  }
}
