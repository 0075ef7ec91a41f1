package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.util.Random

/** Sampling ops: split determinism/stability/proportions, top-k-per-group
  * parity with the naive single-window formulation (including tie-breaks
  * and k > group size), decontamination semantics. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val weights = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  test("hashSplit: deterministic, id-stable under corpus growth, ~weights") {
    val small = Sampling.hashSplit(
      spark.range(0, 2000).toDF("id"), col("id"), weights)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val grown = Sampling.hashSplit(
      spark.range(0, 10000).toDF("id"), col("id"), weights)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // growth never reassigns an existing id (pure function of id)
    small.foreach { case (id, s) => assert(grown(id) === s) }
    val shares = grown.values.groupBy(identity).view.mapValues(_.size / 10000.0)
    assert(math.abs(shares("train") - 0.8) < 0.03)
    assert(math.abs(shares("val") - 0.1) < 0.02)
    assert(math.abs(shares("test") - 0.1) < 0.02)
    // a different salt is an independent split, not a copy
    val resalted = Sampling.hashSplit(
      spark.range(0, 2000).toDF("id"), col("id"), weights, salt = "other")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(small.count { case (id, s) => resalted(id) != s } > 100)
  }

  test("topKPerGroup: parity with the naive single-window top-k") {
    val rnd = new Random(11)
    val rows = (0L until 500L).map(i =>
      (i, s"g${rnd.nextInt(3)}", rnd.nextInt(40).toDouble))
    val df = rows.toDF("id", "g", "score")
    val order = Seq(col("score").desc, col("id").asc)
    for (k <- Seq(1, 7, 300)) { // 300 > every group size
      val got = Sampling.topKPerGroup(df, Seq("g"), order,
        saltBy = col("id"), k = k, salts = 8)
        .select("g", "id", "rank")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
      val naive = df.withColumn("rank",
        row_number().over(Window.partitionBy("g").orderBy(order: _*)))
        .where(col("rank") <= k)
        .select("g", "id", "rank")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
      assert(got === naive, s"k=$k")
    }
  }

  test("packSequences: chunk boundaries match a straight-line reference") {
    // single bucket so the packing order (by id) is fully determined
    val toks = Seq(4L, 5L, 3L, 12L, 0L, 7L, 10L, 1L)
    val df = toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "toks")
    val got = Sampling.packSequences(df, col("id"), col("toks"),
        nBuckets = 1, budget = 10)
      .orderBy("id")
      .select("id", "pack_id", "pack_offset", "n_chunks")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // reference: running start offset, straight-line arithmetic
    var start = 0L
    val expected = toks.zipWithIndex.map { case (t, i) =>
      val packId = start / 10
      val off = start % 10
      val chunks = if (t == 0) 0L else (start + t - 1) / 10 - packId + 1
      start += t
      (i.toLong, packId, off, chunks)
    }
    assert(got.toSeq === expected)
    // doc 3 (12 tokens starting at offset 2 of pack 1) straddles 2 chunks
    assert(got(3) === ((3L, 1L, 2L, 2L)))
    // empty doc spans no chunks but holds its position
    assert(got(4) === ((4L, 2L, 4L, 0L)))
  }

  test("packSequences: bucket assignment is id-stable under corpus growth") {
    val small = Sampling.packSequences(
      spark.range(0, 200).toDF("id").withColumn("toks", lit(5L)),
      col("id"), col("toks"), nBuckets = 8, budget = 50)
      .select("id", "bucket", "pack_id", "pack_offset")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // appending ids 200.. must not move any existing id's bucket, and ids
    // that sort after the old tail must not disturb existing pack layout
    val grown = Sampling.packSequences(
      spark.range(0, 400).toDF("id").withColumn("toks", lit(5L)),
      col("id"), col("toks"), nBuckets = 8, budget = 50)
      .select("id", "bucket", "pack_id", "pack_offset")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    small.foreach { case (id, v) => assert(grown(id) === v, s"id=$id moved") }
  }

  test("decontaminate: drops exactly the fingerprint-sharing candidates") {
    val candidates = Seq(
      (1L, Seq("a", "b")),   // shares "b" with eval -> dropped
      (2L, Seq("c")),        // clean -> kept
      (3L, Seq.empty[String]), // no fingerprints -> kept
      (4L, Seq("d", "e"))    // shares "e" -> dropped
    ).toDF("doc_id", "fps")
    val evalFps = Seq("b", "e", "zz").toDF("fp")
    val kept = Dedup.decontaminate(candidates, "doc_id", "fps", evalFps)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L, 3L))
  }
}
