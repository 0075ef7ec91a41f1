package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.{AsOfJoin, Stats, WindowOps}
import graft.functions.ImageFunctions
import graft.sources.SynthImages

/** The flagship musif-analog query: per-entity x time-window feature
  * extraction with point-in-time label alignment, over the image+caption
  * table (BASELINE.json input_hint).
  *
  * Mirrors `FeaturesExtractor.extract()`
  * (`/root/reference/musif/extract/extract.py:255-311`): per-entity ordered
  * stream -> as-of label join (scale_relative semantics) -> lag-derived
  * "interval" features (melody semantics) -> sessionization -> tumbling
  * window aggregation into one wide feature row per (entity, window).
  *
  * Shuffle budget: ONE exchange by entity feeds the as-of union-window, the
  * lag features, and the sessionization (same partitioning, Catalyst reuses
  * the exchange); the final groupBy(entity, window) is the second exchange.
  * Label-histogram pivot is bounded by the small label domain.
  */
object FeaturePipeline {

  val WindowDuration = "10 minutes"
  val SessionGapSeconds = 3600L

  /** Row-level enriched stream: as-of label + lag features + session ids.
    * Kept separate from the aggregation so tests can assert row-level
    * leakage-freedom. */
  def enrich(images: DataFrame, labels: DataFrame): DataFrame = {
    val withLabel = AsOfJoin.asOf(
      images, labels,
      entityCol = "phash", probeTs = "ts", buildTs = "label_ts",
      payloadCols = Seq("label", "weight"))

    val wEnt = Window.partitionBy(col("phash")).orderBy(col("ts"), col("image_id"))
    val withLag = withLabel
      .withColumn("brightness", ImageFunctions.mean_brightness(col("bytes")))
      .withColumn("caption_tokens", graft.functions.Text.tokenCount(col("caption")))
      .withColumn("brightness_delta",
        col("brightness") - lag(col("brightness"), 1).over(wEnt))
      .withColumn("secs_since_prev",
        unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(wEnt)))
      .withColumn("aspect", col("w").cast("double") / col("h"))

    WindowOps.sessionize(withLag, Seq("phash"), "ts", SessionGapSeconds,
      tieBreak = Seq("image_id"))
  }

  /** One wide feature row per (entity, tumbling window). */
  def features(images: DataFrame, labels: DataFrame): DataFrame = {
    val enriched = enrich(images, labels)
    val labelShares = SynthImages.LABELS.map { l =>
      Stats.safeDiv(
        sum(when(col("label") === l, 1).otherwise(0)),
        count(lit(1))).as(s"label_share_${l.replace(':', '_')}")
    }
    val aggs: Seq[org.apache.spark.sql.Column] = Seq(
        count(lit(1)).as("n_images"),
        avg(col("brightness")).as("brightness_mean"),
        when(count(col("brightness")) > 1, stddev_samp(col("brightness"))).as("brightness_std"),
        Stats.skewnessCorrected(col("brightness")).as("brightness_skew"),
        Stats.kurtosisCorrected(col("brightness")).as("brightness_kurt"),
        avg(abs(col("brightness_delta"))).as("abs_delta_mean"),
        sum(when(col("brightness_delta") > 0, 1).otherwise(0)).as("n_ascending"),
        sum(when(col("brightness_delta") < 0, 1).otherwise(0)).as("n_descending"),
        avg(col("caption_tokens").cast("double")).as("caption_tokens_mean"),
        avg(col("aspect")).as("aspect_mean"),
        // exact distinct counts WITHOUT countDistinct: countDistinct plans an
        // Expand (3x the enriched stream) + a second shuffle. session_id is
        // nondecreasing +1-increment per entity, and a window is a contiguous
        // ts-slice, so ids form a gap-free range -> max-min+1 is exact. The
        // label domain is bounded -> presence-flag sum is exact.
        (max(col("session_id")) - min(col("session_id")) + 1).as("n_sessions"),
        SynthImages.LABELS.map(l =>
          max(when(col("label") === l, 1).otherwise(0))).reduce(_ + _)
          .cast("long").as("n_labels"),
        max(col("weight")).as("weight_max"),
        Stats.safeDiv(sum(when(col("fmt") === "jpg", 1).otherwise(0)),
          count(lit(1))).as("lossy_share")) ++ labelShares
    enriched
      .groupBy(col("phash").as("entity"),
        window(col("ts"), WindowDuration).getField("start").as("window_start"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Convenience entry over synthesized data. */
  def runSynthetic(spark: org.apache.spark.sql.SparkSession, nRows: Long,
                   nEntities: Int = 64): DataFrame = {
    val imgs = SynthImages.images(spark, nRows, nEntities)
    val lbls = SynthImages.labels(spark, nRows, nEntities)
    features(imgs, lbls)
  }
}
