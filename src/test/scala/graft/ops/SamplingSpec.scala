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
