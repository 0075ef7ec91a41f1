package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.ImageCodec

/** Deterministic synthesis of the graft input table
  * (BASELINE.json input_hint): image+caption pairs
  * `(image_id, bytes, w, h, fmt, caption, phash, ts)` plus a sparse as-of
  * label table — the analog of musif's corpus + harmonic-annotation pair
  * (`/root/reference/musif/extract/extract.py:273-303`,
  * `extract/utils.py:20-56`).
  *
  * Every value is a pure function of the row id (seeded via splitmix64),
  * never of partition index or RNG state, so content is identical at any
  * parallelism — the property the local[8]-vs-local[32] scaling evidence
  * depends on. `phash` (the entity key) is drawn with a hot-cluster skew:
  * ~1/16 of rows land on entity 0 and ~1/16 on entity 1 (the "duplicate
  * phash cluster" skew case from the north rule).
  */
object SynthImages {

  val VOCAB: Array[String] = Array(
    "baroque", "aria", "opera", "score", "violin", "oboe", "continuo",
    "soprano", "cadence", "tonic", "dominant", "measure", "tempo", "adagio",
    "allegro", "minuet", "portrait", "landscape", "engraving", "manuscript")

  val LABELS: Array[String] = Array(
    "C:maj", "G:maj", "D:maj", "A:min", "E:min", "F:maj", "B:dim", "D:min")

  private def mix(i: Long, salt: Long): Long = ImageCodec.mix64(i * 0x9e37L + salt)

  /** The images/events table. nEntities controls entity cardinality;
    * rows per entity follow from the skewed assignment.
    *
    * @param hotExtraFraction extra key-space mass EACH of the two hot
    *   entities receives on top of the uniform share. The default 1/16
    *   (~1.9x the mean at 16 entities) exercises the skew-handling paths;
    *   scaling benchmarks pass a smaller value because at 10^12-row scale a
    *   hot phash cluster is a tiny fraction of the total — a 6%-of-all-rows
    *   entity is a small-sample artifact, not the scale regime. */
  def images(spark: SparkSession, nRows: Long, nEntities: Int = 64,
             hotExtraFraction: Double = 1.0 / 16): DataFrame = {
    val hotSpan = math.max(1L, math.round(hotExtraFraction * 16 * nEntities))
    val enc = udf { (id: Long, w: Int, h: Int, lossy: Boolean) =>
      ImageCodec.encode(mix(id, 7L), w, h, lossy)
    }
    val caption = udf { (id: Long) =>
      val k = 4 + (mix(id, 11L) & 3).toInt
      (0 until k).map(j => VOCAB((mix(id, 13L + j) & 0x7fffffffL).toInt % VOCAB.length))
        .mkString(" ")
    }
    val base = spark.range(0, nRows)
      .withColumn("image_id", format_string("img%012d", col("id")))
      // skew: hash bucket, but 2/16 of the space collapses onto entities 0/1
      .withColumn("__hb", pmod(xxhash64(col("id") + 1), lit(16 * nEntities.toLong)))
      .withColumn("phash",
        when(col("__hb") < hotSpan, lit(0L))
          .when(col("__hb") < 2L * hotSpan, lit(1L))
          .otherwise(pmod(col("__hb"), lit(nEntities.toLong))))
      .withColumn("w", (pmod(xxhash64(col("id") + 2), lit(25)) + 8).cast("int"))
      .withColumn("h", (pmod(xxhash64(col("id") + 3), lit(25)) + 8).cast("int"))
      .withColumn("__lossy", pmod(xxhash64(col("id") + 4), lit(4)) === 0)
      .withColumn("fmt", when(col("__lossy"), "jpg").otherwise("png"))
      .withColumn("bytes", enc(col("id"), col("w"), col("h"), col("__lossy")))
      .withColumn("caption", caption(col("id")))

    // Event time: per-entity strictly increasing with deterministic gaps and
    // occasional duplicates. Seconds offset = rank within entity * step +
    // a large jump every ~13th row (sessionization gaps), duplicate ts every
    // ~11th row (as-of tie cases). Ordering by global id is total => the
    // running construction is parallelism-independent.
    val wEnt = Window.partitionBy(col("phash")).orderBy(col("id"))
    base
      .withColumn("__rn", row_number().over(wEnt).cast("long"))
      .withColumn("__gap",
        when(pmod(xxhash64(col("id") + 5), lit(13)) === 0, lit(7200L)).otherwise(lit(0L)))
      .withColumn("__dup",
        when(pmod(xxhash64(col("id") + 6), lit(11)) === 0, lit(-60L)).otherwise(lit(0L)))
      .withColumn("__secs",
        col("__rn") * 60L +
          sum(col("__gap")).over(wEnt.rowsBetween(Window.unboundedPreceding, 0)) +
          col("__dup"))
      .withColumn("ts",
        expr("timestampadd(SECOND, __secs, timestamp'2024-01-01 00:00:00')"))
      .select("image_id", "bytes", "w", "h", "fmt", "caption", "phash", "ts")
  }

  /** Sparse as-of label table: ~1 label per 5 image rows, keyed (phash,
    * label_ts), small categorical domain; includes labels after all events
    * (leakage traps) and entities with zero labels. */
  def labels(spark: SparkSession, nRows: Long, nEntities: Int = 64): DataFrame = {
    val n = math.max(1L, nRows / 5)
    spark.range(0, n)
      .withColumn("phash",
        // entity 2 never gets labels (null-fill path); skew mirrors images
        pmod(xxhash64(col("id") + 21), lit(nEntities.toLong)))
      .filter(col("phash") =!= 2L)
      .withColumn("__secs",
        (pmod(xxhash64(col("id") + 22), lit(nRows * 90L)) + 1L))
      .withColumn("label_ts",
        expr("timestampadd(SECOND, __secs, timestamp'2024-01-01 00:00:00')"))
      .withColumn("label",
        element_at(
          typedLit(LABELS.toSeq),
          (pmod(xxhash64(col("id") + 23), lit(LABELS.length.toLong)) + 1).cast("int")))
      .withColumn("weight",
        (pmod(xxhash64(col("id") + 24), lit(100)) / lit(25.0)))
      .select("phash", "label_ts", "label", "weight")
  }
}
