package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming-shaped variants of the batch feature operators (SURVEY.md §2.8).
  * The reference is batch-only; these exist so the same semantics run under
  * Structured Streaming unchanged — the transforms below accept either a
  * batch DataFrame or a `readStream` DataFrame.
  *
  *  - tumbling/sliding event-time windows == W2's measure windows on the ts
  *    axis (`/root/reference/musif/extract/extract.py:416-464`)
  *  - session windows == W4 gap-based sessionization
  *    (`melody/handler.py:675-689`) via the native `session_window`
  *  - the watermark bounds state and drops late data; in batch the same
  *    query runs with the watermark ignored (Spark semantics), so batch ==
  *    stream on in-order input — the leakage-freedom gate in both modes.
  */
object StreamingFeatures {

  /** Per-(entity, tumbling window) feature aggregates. `watermark` bounds
    * out-of-orderness; windows close and emit once the watermark passes. */
  def windowedFeatures(
      events: DataFrame,
      entityCol: String = "phash",
      tsCol: String = "ts",
      valueCol: String = "value",
      watermark: String = "30 minutes",
      windowDur: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col(entityCol), window(col(tsCol), windowDur))
      .agg(
        count(lit(1)).as("n_events"),
        avg(col(valueCol)).as("value_mean"),
        min(col(valueCol)).as("value_min"),
        max(col(valueCol)).as("value_max"))
      .select(col(entityCol), col("window.start").as("window_start"),
        col("n_events"), col("value_mean"), col("value_min"), col("value_max"))

  /** Per-(entity, SLIDING window) feature aggregates — the streaming face of
    * musif's size/overlap window mode (`extract.py:429-431`: hop = size −
    * overlap), on the time axis: every event lands in size/hop overlapping
    * windows, each of which emits once the watermark passes its end. Pass
    * `overlapDur` in the musif convention; hop is derived. */
  def slidingFeatures(
      events: DataFrame,
      entityCol: String = "phash",
      tsCol: String = "ts",
      valueCol: String = "value",
      watermark: String = "30 minutes",
      windowDur: String = "10 minutes",
      overlapDur: String = "5 minutes"): DataFrame = {
    def minutes(d: String): Long = {
      val p = d.trim.split("\\s+")
      require(p.length == 2, s"duration must be '<n> <unit>': $d")
      p(1).toLowerCase match {
        case "minute" | "minutes" => p(0).toLong
        case "hour" | "hours"     => p(0).toLong * 60
        case "second" | "seconds" =>
          require(p(0).toLong % 60 == 0, s"sub-minute durations unsupported: $d")
          p(0).toLong / 60
        case u => throw new IllegalArgumentException(s"unsupported unit: $u")
      }
    }
    val (size, overlap) = (minutes(windowDur), minutes(overlapDur))
    require(size > overlap && overlap >= 0,
      s"need size > overlap >= 0, got $windowDur / $overlapDur")
    val hop = s"${size - overlap} minutes"
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col(entityCol), window(col(tsCol), windowDur, hop))
      .agg(
        count(lit(1)).as("n_events"),
        avg(col(valueCol)).as("value_mean"),
        min(col(valueCol)).as("value_min"),
        max(col(valueCol)).as("value_max"))
      .select(col(entityCol), col("window.start").as("window_start"),
        col("n_events"), col("value_mean"), col("value_min"), col("value_max"))
  }

  /** Streaming exact dedup on the content fingerprint — the training-data
    * pipeline's O5/exact-dedup stage under Structured Streaming. State is
    * bounded by the watermark (`dropDuplicatesWithinWatermark`): a duplicate
    * arriving within the watermark horizon of its first occurrence is
    * dropped; state for older fingerprints is evicted, so memory is
    * O(arrival rate x horizon), not O(corpus). */
  def dedupStream(
      docs: DataFrame,
      contentCol: String = "caption",
      tsCol: String = "ts",
      watermark: String = "30 minutes"): DataFrame =
    docs
      .withColumn("__fp", graft.functions.Text.fingerprint(col(contentCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** Streaming PERCEPTUAL image dedup — the ingest-time counterpart of
    * `Main --dedup` (batch cares about near-dup clusters; an ingest stream
    * drops exact perceptual copies as they arrive): key the
    * watermark-bounded dedup state on the codegen'd aHash64 of the payload
    * bytes, so re-encoded/requantized copies of the same image (identical
    * 8x8 average-hash) dedup even when their bytes differ. State is one
    * entry per distinct hash inside the watermark horizon.
    *
    * Only STRUCTURALLY VALID payloads (header dims matching the byte
    * length) enter the dedup state: corrupt rows all hash to 0 by the
    * codec's totality contract, so keying them would silently collapse
    * distinct broken rows into one — instead they bypass dedup untouched
    * for the downstream error channel to flag (the ordering `Main` gets
    * from running the error split BEFORE --dedup). Genuinely uniform
    * images share hash 0 and DO dedup — that is the perceptual semantics,
    * not a defect. */
  def dedupImagesStream(
      images: DataFrame,
      bytesCol: String = "bytes",
      tsCol: String = "ts",
      watermark: String = "30 minutes"): DataFrame = {
    val whdr = conv(hex(substring(col(bytesCol), 5, 2)), 16, 10).cast("long")
    val hhdr = conv(hex(substring(col(bytesCol), 7, 2)), 16, 10).cast("long")
    val valid = coalesce(
      col(bytesCol).isNotNull && whdr > 0 && hhdr > 0 &&
        length(col(bytesCol)) ===
          lit(graft.functions.ImageCodec.HeaderLen.toLong) + whdr * hhdr,
      lit(false))
    val deduped = images.where(valid)
      .withColumn("__ah", graft.functions.ImageFunctions.ahash64(col(bytesCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__ah")
      .drop("__ah")
    deduped.unionByName(images.where(!valid))
  }

  /** Gap-based sessions via the native session_window — the streaming
    * counterpart of WindowOps.sessionize (state is per open session, bounded
    * by the watermark instead of unbounded per-entity history). */
  def sessionFeatures(
      events: DataFrame,
      entityCol: String = "phash",
      tsCol: String = "ts",
      valueCol: String = "value",
      watermark: String = "30 minutes",
      gap: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col(entityCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("value_sum"))
      .select(col(entityCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("value_sum"))
}
