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

  test("bucket sizing scales with corpus size") {
    assert(Vectors.planesForCorpus(100) === 4)            // floor
    assert(Vectors.planesForCorpus(64_000, 64) === 10)    // ~1000 buckets
    assert(Vectors.planesForCorpus(100_000_000_000L) === 20) // ceiling
    assert(Vectors.cellsForCorpus(100) === 2)
    assert(Vectors.cellsForCorpus(25_600, 256) === 100)
    assert(Vectors.cellsForCorpus(100_000_000_000L) === 1024)
  }

  /** Deterministic clustered corpus: `n` vectors around `nClusters` centers
    * with bounded noise — the structure ANN recall is measured on. */
  private def clustered(n: Int, nClusters: Int, dim: Int, noise: Double) = {
    val centers = Array.tabulate(nClusters, dim) { (c, d) =>
      ((ImageCodec.mix64(c * 7919L + d) & 0xffff) / 32768.0) - 1.0
    }
    (0 until n).map { i =>
      val c = i % nClusters
      (i.toLong, Array.tabulate(dim) { d =>
        (centers(c)(d) +
          (((ImageCodec.mix64(i * 104729L + d) & 0xffff) / 65536.0) - 0.5) * 2 * noise).toFloat
      })
    }.toDF("vec_id", "embedding")
  }

  private def recallVsExact(approx: org.apache.spark.sql.DataFrame,
                            exact: org.apache.spark.sql.DataFrame): Double = {
    def pairs(df: org.apache.spark.sql.DataFrame) = df.select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val (a, e) = (pairs(approx), pairs(exact))
    a.intersect(e).size.toDouble / e.size
  }

  test("lshTopK recall >= 0.9 vs brute force on a clustered corpus (auto-sized, multiprobe)") {
    val n = 1000
    val vecs = clustered(n, nClusters = 20, dim = 16, noise = 0.1)
    val exact = Vectors.bruteForceTopK(vecs, vecs, "vec_id", "embedding", 10)
    val approx = Vectors.lshTopK(vecs, "vec_id", "embedding",
      k = 10, nPlanes = Vectors.planesForCorpus(n), dim = 16)
    val r = recallVsExact(approx, exact)
    assert(r >= 0.9, s"LSH recall $r < 0.9")
  }

  test("ivfTopK recall >= 0.9 vs brute force on a clustered corpus (auto-sized, multiprobe)") {
    val n = 1000
    val vecs = clustered(n, nClusters = 20, dim = 16, noise = 0.1)
    val exact = Vectors.bruteForceTopK(vecs, vecs, "vec_id", "embedding", 10)
    val approx = Vectors.ivfTopK(vecs, "vec_id", "embedding",
      k = 10, nCells = Vectors.cellsForCorpus(n, 128), dim = 16, probes = 3)
    val r = recallVsExact(approx, exact)
    assert(r >= 0.9, s"IVF recall $r < 0.9")
  }

  test("explicit probe set equals the self-join formulation filtered to those queries") {
    // the query-set-vs-corpus shape must be a pure restriction: same planes,
    // same salting (salt comes from the row's own id), so per-query results
    // are identical to probing everything and filtering afterwards
    val n = 600
    val vecs = clustered(n, nClusters = 12, dim = 16, noise = 0.1)
    val qs = vecs.where(col("vec_id") % 40 === 0)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val lshAll = Vectors.lshTopK(vecs, "vec_id", "embedding",
      k = 5, nPlanes = Vectors.planesForCorpus(n), dim = 16)
      .where(col("query_id") % 40 === 0)
    val lshQ = Vectors.lshTopK(vecs, "vec_id", "embedding",
      k = 5, nPlanes = Vectors.planesForCorpus(n), dim = 16, queries = Some(qs))
    assert(pairs(lshQ) === pairs(lshAll))
    val cells = Vectors.cellsForCorpus(n, 128)
    val ivfAll = Vectors.ivfTopK(vecs, "vec_id", "embedding",
      k = 5, nCells = cells, dim = 16, probes = 2)
      .where(col("query_id") % 40 === 0)
    val ivfQ = Vectors.ivfTopK(vecs, "vec_id", "embedding",
      k = 5, nCells = cells, dim = 16, probes = 2, queries = Some(qs))
    assert(pairs(ivfQ) === pairs(ivfAll))
  }

  test("saltBuckets bounds fan-out on a degenerate bucket (skew-injected)") {
    // 900 identical vectors collapse into ONE bucket; salting must split it
    // into ~cap-sized groups so the self-join can't go quadratic
    val cap = 50
    val skewed = ((0 until 900).map(i => (i.toLong, 7L)) ++
      (900 until 1000).map(i => (i.toLong, i.toLong % 13))).toDF("id", "bucket")
    val salted = Vectors.saltBuckets(skewed, "bucket", "id", cap)
    val maxGroup = salted.groupBy("bucket", "__salt").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(maxGroup <= 2L * cap, s"max (bucket, salt) group $maxGroup exceeds 2*cap")
    assert(salted.count() === 1000) // salting drops/duplicates nothing
  }

  test("trained IVF centroids: deterministic, and recall >= pseudo-random centroids") {
    val n = 1000
    val vecs = clustered(n, nClusters = 20, dim = 16, noise = 0.1)
    val k = Vectors.cellsForCorpus(n, 128)
    val c1 = Vectors.trainCentroids(vecs, "vec_id", "embedding", k, dim = 16)
    val c2 = Vectors.trainCentroids(vecs, "vec_id", "embedding", k, dim = 16)
    assert(c1.map(_.toSeq).toSeq === c2.map(_.toSeq).toSeq) // reproducible
    val exact = Vectors.bruteForceTopK(vecs, vecs, "vec_id", "embedding", 10)
    val trained = Vectors.ivfTopK(vecs, "vec_id", "embedding",
      k = 10, nCells = k, dim = 16, probes = 3, centroids = Some(c1))
    val pseudo = Vectors.ivfTopK(vecs, "vec_id", "embedding",
      k = 10, nCells = k, dim = 16, probes = 3)
    val rTrained = recallVsExact(trained, exact)
    val rPseudo = recallVsExact(pseudo, exact)
    assert(rTrained >= 0.9, s"trained-centroid recall $rTrained < 0.9")
    assert(rTrained >= rPseudo - 0.02,
      s"training must not lose recall: $rTrained vs pseudo $rPseudo")
  }

  test("saltBuckets preserves ALL pairs for buckets at or below cap (no recall loss)") {
    // the salt must be a pure no-op below the cap: joining on (bucket, salt)
    // yields exactly the pairs of joining on bucket alone
    val rows = (0 until 300).map { i =>
      (i.toLong, (ImageCodec.mix64(i * 17L) % 40).toString) // buckets of ~7-8 rows
    }.toDF("id", "bucket")
    val plain = rows.select(col("bucket"), col("id").as("a"))
      .join(rows.select(col("bucket"), col("id").as("b")), Seq("bucket"))
      .where(col("a") < col("b"))
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val salted = Vectors.saltBuckets(rows, "bucket", "id", cap = 50)
    val viaSalt = salted.select(col("bucket"), col("__salt"), col("id").as("a"))
      .join(salted.select(col("bucket"), col("__salt"), col("id").as("b")),
        Seq("bucket", "__salt"))
      .where(col("a") < col("b"))
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaSalt === plain)
  }

  test("lshTopK stays correct and bounded under an identical-vector cluster") {
    // 400 copies of one vector + 100 distinct: top-k for copies are other
    // copies (cos = 1.0); bucket cap keeps candidate groups bounded
    val base = Array.tabulate(8)(d => (d + 1).toFloat)
    val vecs = ((0 until 400).map(i => (i.toLong, base)) ++
      (400 until 500).map { i =>
        (i.toLong, Array.tabulate(8)(d =>
          ((ImageCodec.mix64(i * 31L + d) & 0xff) / 128.0 - 1.0).toFloat))
      }).toDF("vec_id", "embedding")
    val out = Vectors.lshTopK(vecs, "vec_id", "embedding",
      k = 3, nPlanes = 4, dim = 8, cap = 32)
    val dupRows = out.where(col("query_id") < 400).collect()
    assert(dupRows.nonEmpty)
    assert(dupRows.forall(r => math.abs(r.getAs[Double]("cos") - 1.0) < 1e-9),
      "an identical-cluster query must rank other copies (cos=1) on top")
  }
}
