package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Synthesis determinism: content must be a pure function of the row id —
  * identical at any parallelism (the property the local[8]/local[32] scaling
  * evidence rests on). */
class SynthImagesSpec extends SparkSpec {

  test("images: identical content regardless of partitioning") {
    val a = SynthImages.images(spark, 500, 8).orderBy("image_id")
      .withColumn("b64", base64(col("bytes"))).drop("bytes").collect()
    val b = SynthImages.images(spark, 500, 8).repartition(13).orderBy("image_id")
      .withColumn("b64", base64(col("bytes"))).drop("bytes").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("images: schema matches the input_hint + ts; ts increases per entity") {
    val df = SynthImages.images(spark, 300, 8)
    assert(df.columns.toSeq === Seq("image_id", "bytes", "w", "h", "fmt", "caption", "phash", "ts"))
    val violations = df
      .withColumn("prev", lag(col("ts"), 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("phash").orderBy("ts", "image_id")))
      .where(col("prev") > col("ts")).count()
    assert(violations === 0L)
  }

  test("images: hot-cluster skew exists (entities 0/1 oversized)") {
    val counts = SynthImages.images(spark, 2000, 16)
      .groupBy("phash").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hot entities own 30/256 of the key space vs 14/256 for cold ones
    // (~1.9x the mean) — assert clearly above the uniform share
    val mean = counts.values.sum.toDouble / counts.size
    assert(counts(0L) > 1.5 * mean && counts(1L) > 1.5 * mean,
      s"expected hot entities, got $counts")
  }

  test("labels: sparse, entity 2 excluded (null-fill path), deterministic") {
    val l = SynthImages.labels(spark, 1000, 8)
    assert(l.where(col("phash") === 2L).count() === 0L)
    assert(l.count() > 0)
    val a = l.orderBy("phash", "label_ts", "label").collect()
    val b = SynthImages.labels(spark, 1000, 8).repartition(7)
      .orderBy("phash", "label_ts", "label").collect()
    assert(a.toSeq === b.toSeq)
  }
}
