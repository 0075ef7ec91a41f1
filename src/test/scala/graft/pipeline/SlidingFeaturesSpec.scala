package graft.pipeline

import graft.SparkSpec
import graft.sources.SynthImages
import org.apache.spark.sql.functions._

/** musif's measure-window mode: window/overlap membership, reference window
  * count, and per-window n_images bookkeeping. */
class SlidingFeaturesSpec extends SparkSpec {

  test("sliding windows: count matches musif's (n - overlap) // hop") {
    val imgs = SynthImages.images(spark, 600, 4)
    val lbls = SynthImages.labels(spark, 600, 4)
    val size = 10; val overlap = 5; val hop = size - overlap
    val out = FeaturePipeline.featuresSliding(imgs, lbls, size, overlap)

    val perEntity = imgs.groupBy("phash").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val windows = out.groupBy("entity").agg(max(col("window_id")).as("maxw"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    perEntity.foreach { case (e, n) =>
      // every event position lands in floor(seq/hop) as its last window ->
      // max window id = floor((n-1)/hop)
      assert(windows(e) === (n - 1) / hop, s"entity $e n=$n")
    }
    // a full interior window holds exactly `size` events
    val full = out.where(col("n_images") === size).count()
    assert(full > 0)
    assert(out.columns.contains("window_range"))
  }

  test("window membership: interior events appear in size/hop windows") {
    val imgs = SynthImages.images(spark, 200, 2)
    val lbls = SynthImages.labels(spark, 200, 2)
    val out = FeaturePipeline.featuresSliding(imgs, lbls, 8, 4)
    // total exploded rows = sum over windows of n_images; interior events
    // count twice (size/hop = 2) so the total exceeds the input count
    val total = out.agg(sum(col("n_images"))).collect()(0).getLong(0)
    val n = imgs.count()
    assert(total > n && total <= 2 * n)
  }
}
