package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{AudioCodec, ImageCodec}

/** Deterministic synthesis of the audio-leg multimodal table
  * `(clip_id, samples:binary, sr, n, fmt, transcript, phash, ts)` — the
  * audio counterpart of [[SynthImages]] (build brief: treat image/audio/
  * video as opaque binary columns with typed metadata). Every value is a
  * pure function of the row id, so content is identical at any
  * parallelism. */
object SynthAudio {

  private def mix(i: Long, salt: Long): Long = ImageCodec.mix64(i * 0x9e37L + salt)

  private val SampleRates = Array(8000, 16000, 22050, 44100)

  def clips(spark: SparkSession, nRows: Long, nEntities: Int = 64): DataFrame = {
    val enc = udf { (id: Long, sr: Int, n: Int, lossy: Boolean) =>
      AudioCodec.encode(mix(id, 29L), sr, n, lossy)
    }
    val transcript = udf { (id: Long) =>
      val k = 3 + (mix(id, 31L) & 3).toInt
      (0 until k).map(j =>
        SynthImages.VOCAB((mix(id, 37L + j) & 0x7fffffffL).toInt % SynthImages.VOCAB.length))
        .mkString(" ")
    }
    spark.range(0, nRows)
      .withColumn("clip_id", format_string("aud%012d", col("id")))
      .withColumn("phash", pmod(xxhash64(col("id") + 51), lit(nEntities.toLong)))
      .withColumn("sr", element_at(typedLit(SampleRates.toSeq),
        (pmod(xxhash64(col("id") + 52), lit(SampleRates.length.toLong)) + 1).cast("int")))
      .withColumn("n", (pmod(xxhash64(col("id") + 53), lit(449)) + 64).cast("int"))
      .withColumn("__lossy", pmod(xxhash64(col("id") + 54), lit(4)) === 0)
      .withColumn("fmt", when(col("__lossy"), "mp3").otherwise("wav"))
      .withColumn("samples", enc(col("id"), col("sr"), col("n"), col("__lossy")))
      .withColumn("transcript", transcript(col("id")))
      .withColumn("ts",
        expr("timestampadd(SECOND, id * 30, timestamp'2024-01-01 00:00:00')"))
      .select("clip_id", "samples", "sr", "n", "fmt", "transcript", "phash", "ts")
  }
}
