package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{ImageCodec, VideoCodec}

/** Deterministic synthesis of the video-leg multimodal table
  * `(clip_id, video:binary, n_frames, w, h, fmt, phash, ts)` — multi-frame
  * binary containers completing the image/audio/video triad. Pure function
  * of the row id, parallelism-independent. */
object SynthVideo {

  private def mix(i: Long, salt: Long): Long = ImageCodec.mix64(i * 0x9e37L + salt)

  def clips(spark: SparkSession, nRows: Long, nEntities: Int = 64): DataFrame = {
    val enc = udf { (id: Long, nf: Int, w: Int, h: Int) =>
      VideoCodec.encode(mix(id, 61L), nf, w, h)
    }
    spark.range(0, nRows)
      .withColumn("clip_id", format_string("vid%012d", col("id")))
      .withColumn("phash", pmod(xxhash64(col("id") + 71), lit(nEntities.toLong)))
      .withColumn("n_frames", (pmod(xxhash64(col("id") + 72), lit(9)) + 4).cast("int"))
      .withColumn("w", (pmod(xxhash64(col("id") + 73), lit(9)) + 8).cast("int"))
      .withColumn("h", (pmod(xxhash64(col("id") + 74), lit(9)) + 8).cast("int"))
      .withColumn("fmt", lit("gv"))
      .withColumn("video", enc(col("id"), col("n_frames"), col("w"), col("h")))
      .withColumn("ts",
        expr("timestampadd(SECOND, id * 45, timestamp'2024-01-01 00:00:00')"))
      .select("clip_id", "video", "n_frames", "w", "h", "fmt", "phash", "ts")
  }
}
