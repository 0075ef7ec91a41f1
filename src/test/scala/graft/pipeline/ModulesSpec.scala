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
