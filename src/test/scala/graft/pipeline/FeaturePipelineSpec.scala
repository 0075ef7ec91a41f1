package graft.pipeline

import graft.SparkSpec
import graft.sources.SynthImages
import org.apache.spark.sql.functions._

/** North-rule gates at pipeline level: zero temporal leakage, parallelism
  * invariance (allclose), golden row-level checks on a hand-computed case. */
class FeaturePipelineSpec extends SparkSpec {
  import spark.implicits._

  private val N = 3000L
  private val E = 16

  test("flagship produces one row per (entity, window) with expected schema") {
    val out = FeaturePipeline.runSynthetic(spark, N, E)
    val cols = out.columns.toSet
    assert(Set("entity", "window_start", "n_images", "brightness_mean",
      "n_sessions", "n_labels", "lossy_share").subsetOf(cols))
    val n = out.count()
    assert(n > 0)
    assert(out.groupBy("entity", "window_start").count().where(col("count") > 1).count() === 0)
  }

  test("zero temporal leakage: labels after the horizon change nothing") {
    val imgs = SynthImages.images(spark, N, E)
    val lbls = SynthImages.labels(spark, N, E)
    val future = lbls.withColumn("label_ts",
      expr("timestampadd(DAY, 3650, label_ts)"))
      .withColumn("label", lit("LEAK")).withColumn("weight", lit(1e9))
    val base = FeaturePipeline.features(imgs, lbls)
    val withFuture = FeaturePipeline.features(imgs, lbls.unionByName(future))
    assertSameRows(base, withFuture)
  }

  test("parallelism invariance: same feature vectors at any partitioning") {
    val imgs = SynthImages.images(spark, N, E)
    val lbls = SynthImages.labels(spark, N, E)
    val a = FeaturePipeline.features(imgs.repartition(2), lbls.repartition(9))
    val b = FeaturePipeline.features(imgs.repartition(17), lbls.repartition(3))
    assertSameRows(a, b, tol = 1e-9)
  }

  test("golden hand-computed case: one entity, two windows") {
    // 3 images in window [00:00,00:10), 1 in [00:10,00:20); one label before
    // the 2nd image. Brightness from the codec is deterministic.
    val imgs = Seq(
      ("i1", ImageCodec_enc(1), 4, 4, "png", "one two", 5L, ts("2024-01-01 00:01:00")),
      ("i2", ImageCodec_enc(2), 4, 4, "png", "three", 5L, ts("2024-01-01 00:05:00")),
      ("i3", ImageCodec_enc(3), 4, 4, "jpg", "four five six", 5L, ts("2024-01-01 00:09:00")),
      ("i4", ImageCodec_enc(4), 4, 4, "png", "seven", 5L, ts("2024-01-01 00:11:00"))
    ).toDF("image_id", "bytes", "w", "h", "fmt", "caption", "phash", "ts")
    val lbls = Seq((5L, ts("2024-01-01 00:03:00"), "C:maj", 2.0))
      .toDF("phash", "label_ts", "label", "weight")

    val out = FeaturePipeline.features(imgs, lbls)
      .orderBy("window_start").collect()
    assert(out.length === 2)
    val w1 = out(0); val w2 = out(1)
    assert(w1.getAs[Long]("n_images") === 3L)
    assert(w2.getAs[Long]("n_images") === 1L)
    // i1 has no label yet (00:01 < 00:03) -> window 1 sees exactly 1 distinct label
    assert(w1.getAs[Long]("n_labels") === 1L)
    assert(w2.getAs[Long]("n_labels") === 1L)
    assert(math.abs(w1.getAs[Double]("lossy_share") - 1.0 / 3.0) < 1e-12)
    assert(w1.getAs[Long]("n_sessions") === 1L)
    // caption tokens: (2 + 1 + 3)/3 = 2.0
    assert(math.abs(w1.getAs[Double]("caption_tokens_mean") - 2.0) < 1e-12)
    // brightness mean matches the codec directly
    val expB = Seq(1, 2, 3).map(i => graft.functions.ImageCodec.meanBrightness(ImageCodec_enc(i))).sum / 3.0
    assert(math.abs(w1.getAs[Double]("brightness_mean") - expB) < 1e-9)
    // label share: 2 of 3 rows in w1 carry C:maj
    assert(math.abs(w1.getAs[Double]("label_share_C_maj") - 2.0 / 3.0) < 1e-12)
  }

  private def ImageCodec_enc(i: Int): Array[Byte] =
    graft.functions.ImageCodec.encode(i.toLong, 4, 4, lossy = false)

  test("row-level enrich: as-of label visible only at-or-after label_ts") {
    val imgs = Seq(
      ("i1", ImageCodec_enc(1), 4, 4, "png", "a", 5L, ts("2024-01-01 00:01:00")),
      ("i2", ImageCodec_enc(2), 4, 4, "png", "b", 5L, ts("2024-01-01 00:03:00")),
      ("i3", ImageCodec_enc(3), 4, 4, "png", "c", 5L, ts("2024-01-01 00:05:00"))
    ).toDF("image_id", "bytes", "w", "h", "fmt", "caption", "phash", "ts")
    val lbls = Seq((5L, ts("2024-01-01 00:03:00"), "X", 1.0))
      .toDF("phash", "label_ts", "label", "weight")
    val got = FeaturePipeline.enrich(imgs, lbls)
      .orderBy("ts").select("image_id", "label").collect()
      .map(r => (r.getString(0), Option(r.getString(1)))).toSeq
    assert(got === Seq(("i1", None), ("i2", Some("X")), ("i3", Some("X"))))
  }
}
