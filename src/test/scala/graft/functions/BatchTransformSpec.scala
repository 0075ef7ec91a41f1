package graft.functions

import graft.SparkSpec
import graft.sources.SynthImages
import org.apache.spark.sql.functions._

class BatchTransformSpec extends SparkSpec {

  test("frameSample: 1 image -> ceil(h/stride) frames, strips decode back") {
    val imgs = SynthImages.images(spark, 20, 4)
    val frames = BatchTransform.frameSample(imgs, stride = 4)
    assert(frames.schema === BatchTransform.frameSchema)

    val expected = imgs.select(col("image_id"), col("h")).collect()
      .map(r => r.getString(0) -> ((r.getInt(1) + 3) / 4)).toMap
    val got = frames.groupBy("image_id").count().collect()
      .map(r => r.getString(0) -> r.getLong(1).toInt).toMap
    assert(got === expected)

    // strip content equals the source rows: frame 0 == image row 0
    val img0 = imgs.orderBy("image_id").select("image_id", "bytes", "w").collect()(0)
    val f0 = frames.where(col("image_id") === img0.getString(0) && col("frame_idx") === 0)
      .select("frame_bytes").collect()(0).getAs[Array[Byte]](0)
    val srcPixels = ImageCodec.decode(img0.getAs[Array[Byte]]("bytes")).take(img0.getInt(2))
    assert(ImageCodec.decode(f0).toSeq === srcPixels.toSeq)
  }

  test("frameSample survives a truncated payload (header claims more strips)") {
    // header declares 8 strips but only 3 are present: sample from the real
    // payload instead of throwing in arraycopy
    val full = ImageCodec.encode(42L, 4, 8, lossy = false)
    val truncated = full.take(ImageCodec.HeaderLen + 3 * 4)
    import spark.implicits._
    val df = Seq(("img-t", truncated)).toDF("image_id", "bytes")
    val frames = BatchTransform.frameSample(df, stride = 1).collect()
    assert(frames.length === 3)
  }

  test("frameSample plan is narrow (no shuffle)") {
    val imgs = SynthImages.images(spark, 10, 2)
    val afterSynthesis = imgs.queryExecution.executedPlan.toString.count(_ == '\n')
    val plan = BatchTransform.frameSample(imgs, 2).queryExecution.executedPlan.toString
    // the transform adds no Exchange beyond what synthesis itself contains
    val synthEx = imgs.queryExecution.executedPlan.toString
      .sliding("Exchange".length).count(_ == "Exchange")
    val allEx = plan.sliding("Exchange".length).count(_ == "Exchange")
    assert(allEx <= synthEx, s"frameSample added a shuffle:\n$plan")
  }
}
