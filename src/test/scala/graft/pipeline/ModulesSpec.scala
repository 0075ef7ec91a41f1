package graft.pipeline

import graft.SparkSpec
import graft.sources.SynthImages

class ModulesSpec extends SparkSpec {

  test("resolve: dependencies pulled in, topological order, request-order ties") {
    val mods = FeatureModules.resolve(Seq("brightness", "session"))
    assert(mods.map(_.name) === Seq("core", "brightness", "session"))
  }

  test("resolve: unknown module and cycles rejected") {
    intercept[IllegalArgumentException](FeatureModules.resolve(Seq("nope")))
    val a: FeatureModule = new FeatureModule {
      val name = "a"; override val dependencies = Seq("b")
    }
    val b: FeatureModule = new FeatureModule {
      val name = "b"; override val dependencies = Seq("a")
    }
    intercept[IllegalArgumentException](FeatureModules.resolve(Seq("a"), Seq(a, b)))
  }

  test("module subset produces exactly its columns") {
    val imgs = SynthImages.images(spark, 500, 8)
    val lbls = SynthImages.labels(spark, 500, 8)
    val df = FeaturePipeline.features(imgs, lbls, Seq("caption"))
    assert(df.columns.toSeq === Seq("entity", "window_start", "n_images", "caption_tokens_mean"))
    assert(df.count() > 0)
  }

  test("pre-pipeline hook mutates the stream before any module runs (precache_hooks analog)") {
    val imgs = SynthImages.images(spark, 1000, 8)
    val lbls = SynthImages.labels(spark, 1000, 8)
    val hook: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      _.withColumn("caption", org.apache.spark.sql.functions.lit("one two three"))
    val out = FeaturePipeline.features(imgs, lbls,
      GraftConfig(preHooks = Seq(hook)))
    // every window's caption_tokens_mean is exactly 3 -> the hook rewrote
    // the caption BEFORE CaptionModule.prepare tokenized it
    val mm = out.agg(
      org.apache.spark.sql.functions.min("caption_tokens_mean"),
      org.apache.spark.sql.functions.max("caption_tokens_mean")).collect()(0)
    assert(mm.getDouble(0) === 3.0 && mm.getDouble(1) === 3.0)
    // and without the hook the captions vary
    val base = FeaturePipeline.features(imgs, lbls, GraftConfig())
    val bm = base.agg(
      org.apache.spark.sql.functions.min("caption_tokens_mean"),
      org.apache.spark.sql.functions.max("caption_tokens_mean")).collect()(0)
    assert(bm.getDouble(0) !== bm.getDouble(1))
  }

  test("full module set matches the one-shot pipeline columns") {
    val imgs = SynthImages.images(spark, 300, 8)
    val lbls = SynthImages.labels(spark, 300, 8)
    val full = FeaturePipeline.features(imgs, lbls)
    val cols = full.columns.toSet
    assert(Set("n_images", "brightness_mean", "brightness_skew", "caption_tokens_mean",
      "aspect_mean", "lossy_share", "n_sessions", "n_labels", "weight_max",
      "label_share_C_maj").subsetOf(cols))
  }
}
