package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corrupt-row channel (SURVEY.md §2.1 S7): musif appends per-file failures
  * to `error_files.csv` and skips them under `ignore_errors`
  * (`/root/reference/musif/extract/extract.py:313-354`). Spark-first shape:
  * validate rows with named predicate checks in ONE pass, split into a good
  * stream and an errors stream carrying the failed-check names — the
  * `badRecordsPath` pattern expressed as a pure transform so it composes
  * with any source.
  */
object ErrorChannel {

  /** Named validation checks for the image+caption input table. */
  def imageChecks: Seq[(String, Column)] = Seq(
    "bytes_present" -> col("bytes").isNotNull,
    "bytes_length" ->
      (length(col("bytes")) === col("w") * col("h") + graft.functions.ImageCodec.HeaderLen),
    "dims_positive" -> (col("w") > 0 && col("h") > 0),
    "fmt_known" -> col("fmt").isin("png", "jpg"),
    "caption_present" -> (col("caption").isNotNull && length(col("caption")) > 0),
    "ts_present" -> col("ts").isNotNull)

  /** Named validation checks for the audio clip table (same contract:
    * header-derived length must match the typed metadata columns). */
  def audioChecks: Seq[(String, Column)] = Seq(
    "samples_present" -> col("samples").isNotNull,
    "samples_length" ->
      (length(col("samples")) === col("n") + graft.functions.AudioCodec.HeaderLen),
    "sr_known" -> col("sr").isin(8000, 16000, 22050, 44100),
    "n_positive" -> (col("n") > 0),
    "fmt_known" -> col("fmt").isin("wav", "mp3"))

  /** Named validation checks for the video container table. */
  def videoChecks: Seq[(String, Column)] = Seq(
    "video_present" -> col("video").isNotNull,
    "video_length" ->
      (length(col("video")) ===
        col("n_frames") * col("w") * col("h") + graft.functions.VideoCodec.HeaderLen),
    "dims_positive" -> (col("w") > 0 && col("h") > 0 && col("n_frames") > 0),
    "fmt_known" -> (col("fmt") === "gv"))

  /** Adds `__errors: array<string>` of failed check names (empty = valid). */
  def validate(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    val errs = checks.map { case (name, pred) =>
      when(pred, lit(null).cast("string")).otherwise(lit(name))
    }
    df.withColumn("__errors",
      filter(array(errs: _*), e => e.isNotNull))
  }

  /** Split into (good rows without the marker column, error rows with the
    * failed checks). Both sides derive from one validated plan — with the
    * input cached or a single pass per side, no per-check jobs. */
  def split(df: DataFrame, checks: Seq[(String, Column)]): (DataFrame, DataFrame) = {
    val v = validate(df, checks)
    val good = v.where(size(col("__errors")) === 0).drop("__errors")
    val bad = v.where(size(col("__errors")) > 0)
      .withColumn("error_reasons", array_join(col("__errors"), ";"))
      .drop("__errors")
    (good, bad)
  }
}
