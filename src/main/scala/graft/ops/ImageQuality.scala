package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.ImageFunctions

/** The image-side keep/drop DECISION layer (the [[QualityFilter]] analog
  * for the payload axis): named per-image rules over structure, geometry,
  * and pixel statistics, reported ErrorChannel-style with a `keep` flag
  * and the ';'-joined violated-rule list.
  *
  * Pixel statistics (mean brightness, contrast std) come from exact
  * integer moments inside codegen'd Catalyst expressions, so the same
  * thresholds compare identically in a DuckDB replay of the stored bytes.
  * Statistic rules only arm on structurally valid payloads — a corrupt
  * row's zero mean must flag `corrupt`, not `too_dark`. Everything is a
  * per-row expression: no shuffle anywhere.
  */
object ImageQuality {

  /** Defaults sized to the synthetic gradient+noise corpus so every rule
    * has a live population (means cluster in [121, 132], stds in
    * [54, 65]); production thresholds are per-corpus config. */
  case class Thresholds(
      minPixels: Int = 256,
      maxAspect: Int = 2,
      minMean: Double = 124.0,
      maxMean: Double = 129.0,
      minStd: Double = 56.0)

  /** `images` needs (image_id, bytes, w, h, caption); w/h are the METADATA
    * dims (the error-channel convention — for valid payloads they equal
    * the header). Emits (image_id, keep, reasons). */
  def classify(images: DataFrame, t: Thresholds = Thresholds()): DataFrame = {
    // coalesce: NULL metadata dims must land on the corrupt branch, not
    // NULL-suppress every rule and slip through keep=true; HeaderLen from
    // the codec so this stays the BYTE-STRUCTURE SUBSET of
    // ErrorChannel.imageChecks (dims/length agreement; it deliberately
    // omits the fmt_known and caption/ts checks — in the q100 funnel the
    // error split runs first and owns those, while a standalone classify()
    // call only gates on payload structure plus its own caption rule)
    val valid = coalesce(
      col("bytes").isNotNull && col("w").isNotNull && col("h").isNotNull &&
        col("w") > 0 && col("h") > 0 &&
        length(col("bytes")) === col("w") * col("h") +
          lit(graft.functions.ImageCodec.HeaderLen),
      lit(false))
    val mean = ImageFunctions.mean_brightness(col("bytes"))
    val std = ImageFunctions.pixel_std(col("bytes"))
    val checks: Seq[(String, Column)] = Seq(
      "corrupt" -> !valid,
      "too_small" -> (col("w") * col("h") < t.minPixels),
      "extreme_aspect" -> (col("w") > lit(t.maxAspect) * col("h") ||
        col("h") > lit(t.maxAspect) * col("w")),
      "too_dark" -> (valid && mean < t.minMean),
      "too_bright" -> (valid && mean > t.maxMean),
      "low_contrast" -> (valid && std < t.minStd),
      "caption_missing" -> (col("caption").isNull || length(col("caption")) === 0))
    val reasonArr = array(checks.map { case (name, cond) =>
      when(coalesce(cond, lit(false)), name).otherwise(lit(null))
    }: _*)
    images.select(col("image_id"),
      array_join(filter(reasonArr, x => x.isNotNull), ";").as("reasons"))
      .withColumn("keep", col("reasons") === "")
  }
}
