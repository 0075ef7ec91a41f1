package graft.pipeline

import graft.SparkSpec
import graft.sources.SynthImages
import org.apache.spark.sql.functions._

/** musif's measure-window mode: window count == (n - overlap) // hop with
  * trailing partials excluded, every window exactly full, and lag/session
  * state scoped to the window slice. */
class SlidingFeaturesSpec extends SparkSpec {

  private val size = 10; private val overlap = 5; private val hop = size - overlap

  test("window count matches musif's (n - overlap) // hop; all windows full") {
    val imgs = SynthImages.images(spark, 600, 4)
    val lbls = SynthImages.labels(spark, 600, 4)
    val out = FeaturePipeline.featuresSliding(imgs, lbls, size, overlap)

    val perEntity = imgs.groupBy("phash").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val windows = out.groupBy("entity").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    perEntity.foreach { case (e, n) =>
      val expected = math.max(0L, (n - overlap) / hop) // n > overlap here
      assert(windows.getOrElse(e, 0L) === expected, s"entity $e n=$n")
    }
    // trailing partials are excluded -> every emitted window holds `size`
    assert(out.where(col("n_images") =!= size).count() === 0L)
    assert(out.columns.contains("window_range"))
  }

  test("tiny entity below one window emits nothing (musif empty-range case)") {
    import spark.implicits._
    val imgs = SynthImages.images(spark, 300, 4)
    val lbls = SynthImages.labels(spark, 300, 4)
    // keep only 3 events of one entity: (3 - 5) // 5 <= 0 -> zero windows
    val few = imgs.where(col("phash") === 3L).limit(3)
    assert(FeaturePipeline.featuresSliding(few, lbls, size, overlap).count() === 0L)
  }

  test("lag state does not cross the window boundary") {
    val imgs = SynthImages.images(spark, 400, 2)
    val lbls = SynthImages.labels(spark, 400, 2)
    val out = FeaturePipeline.featuresSliding(imgs, lbls, size, overlap)
    // each window has exactly size rows and its first row's delta is null
    // (no out-of-window interval), so ascending+descending <= size - 1
    val bad = out.where(col("n_ascending") + col("n_descending") > size - 1).count()
    assert(bad === 0L)
    assert(out.count() > 0)
  }
}
