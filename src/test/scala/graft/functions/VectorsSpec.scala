package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorsSpec extends SparkSpec {
  import spark.implicits._

  test("dot / norm / cosine over array columns") {
    val df = Seq((Array(1.0, 2.0, 2.0), Array(2.0, 0.0, 1.0))).toDF("a", "b")
    val r = df.select(
      Vectors.dot(col("a"), col("b")).as("d"),
      Vectors.norm(col("a")).as("na"),
      Vectors.cosine(col("a"), col("b")).as("c")).collect()(0)
    assert(r.getDouble(0) === 4.0)
    assert(r.getDouble(1) === 3.0)
    assert(math.abs(r.getDouble(2) - 4.0 / (3.0 * math.sqrt(5.0))) < 1e-12)
  }

  test("cosine with zero vector -> 0 (safe-div convention)") {
    val df = Seq((Array(0.0, 0.0), Array(1.0, 1.0))).toDF("a", "b")
    assert(df.select(Vectors.cosine(col("a"), col("b"))).collect()(0).getDouble(0) === 0.0)
  }

  test("bruteForceTopK: exact ranks on a hand-checkable set") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),   // closest to 0
      (2L, Array(0.0f, 1.0f)),   // orthogonal to 0
      (3L, Array(0.7f, 0.7f))    // middle
    ).toDF("vec_id", "embedding")
    val got = Vectors.bruteForceTopK(vecs.where(col("vec_id") === 0), vecs, "vec_id", "embedding", 2)
      .orderBy("rank").select("neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got === Seq((1L, 1), (3L, 2)))
  }

  test("lshTopK: bounded k, cos consistent with exact cosine, self excluded") {
    val vecs = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(8)(d => ((ImageCodec.mix64(i * 31L + d) & 0xff) / 128.0 - 1.0).toFloat))
    }.toDF("vec_id", "embedding")
    val out = Vectors.lshTopK(vecs, "vec_id", "embedding", k = 3, nPlanes = 4, dim = 8)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Int]("rank") <= 3))
    assert(rows.forall(r => r.getAs[Long]("query_id") != r.getAs[Long]("neighbor_id")))
    // spot-check one returned cos against the exact formula
    val r0 = rows.head
    val m = vecs.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    val (q, n) = (m(r0.getAs[Long]("query_id")), m(r0.getAs[Long]("neighbor_id")))
    val exact = q.zip(n).map { case (x, y) => x * y }.sum /
      (math.sqrt(q.map(x => x * x).sum) * math.sqrt(n.map(x => x * x).sum))
    assert(math.abs(r0.getAs[Double]("cos") - exact) < 1e-9)
  }

  test("ivfTopK: bounded k, self excluded, cells deterministic") {
    val vecs = (0 until 60).map { i =>
      (i.toLong, Array.tabulate(8)(d => ((ImageCodec.mix64(i * 131L + d) & 0xff) / 128.0 - 1.0).toFloat))
    }.toDF("vec_id", "embedding")
    val out = Vectors.ivfTopK(vecs, "vec_id", "embedding", k = 3, nCells = 4, dim = 8)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Int]("rank") <= 3))
    assert(rows.forall(r => r.getAs[Long]("query_id") != r.getAs[Long]("neighbor_id")))
    assert(Vectors.ivfCentroids(4, 8).map(_.toSeq).toSeq ===
      Vectors.ivfCentroids(4, 8).map(_.toSeq).toSeq)
    // an IVF neighbor's cos must equal the exact cosine for that pair
    val m = vecs.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    val r0 = rows.head
    val (q, n) = (m(r0.getAs[Long]("query_id")), m(r0.getAs[Long]("neighbor_id")))
    val exact = q.zip(n).map { case (x, y) => x * y }.sum /
      (math.sqrt(q.map(x => x * x).sum) * math.sqrt(n.map(x => x * x).sum))
    assert(math.abs(r0.getAs[Double]("cos") - exact) < 1e-9)
  }

  test("hyperplanes are deterministic") {
    assert(Vectors.hyperplanes(4, 8).map(_.toSeq).toSeq ===
      Vectors.hyperplanes(4, 8).map(_.toSeq).toSeq)
  }
}
