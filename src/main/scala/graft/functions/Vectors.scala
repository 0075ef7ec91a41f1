package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity: cosine via codegen'd higher-order functions
  * (`zip_with` + `aggregate` — no UDF in the hot path), brute-force top-k as
  * the exact baseline, and a hyperplane-LSH bucketed variant as the scale
  * path (bucket join instead of full cross product).
  */
object Vectors {

  /** Element-wise dot product over array<double> columns. Summation is in
    * array element order — identical order in any engine, so results are
    * reproducible bit-for-bit. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn =!= 0.0, d / nn).otherwise(lit(0.0))
  }

  def toDoubleArray(a: Column): Column = transform(a, _.cast("double"))

  /** Exact brute-force cosine top-k: queries X candidates cross join (the
    * query side is small -> broadcast), rank per query, keep k.
    * At scale: |queries| bounded, candidates scanned once, no shuffle of the
    * candidate side (broadcast of queries + local top-k via window over
    * query partitions after a single exchange of the slim (qid, vid, cos)
    * projection). */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), toDoubleArray(col(vecCol)).as("__qv"))
    val c = candidates.select(col(idCol).as("neighbor_id"), toDoubleArray(col(vecCol)).as("__cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qv"), col("__cv")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Deterministic random hyperplanes: nPlanes x dim sign matrix seeded by
    * (plane, coordinate) — parallelism-independent. The seed packs plane
    * and coordinate into disjoint bit ranges so no two (p, d) pairs alias
    * (a linear p*k+d seed collides once dim exceeds k, correlating
    * "independent" planes). */
  def hyperplanes(nPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes, dim) { (p, d) =>
      if ((ImageCodec.mix64((p.toLong << 32) | d.toLong) & 1L) == 0L) 1.0 else -1.0
    }

  /** Sign-LSH bucket id: one bit per hyperplane. Vectors in the same bucket
    * are ANN candidates; join on bucket replaces the cross product. */
  def lshBucket(vecCol: Column, nPlanes: Int, dim: Int): Column = {
    require(nPlanes >= 1 && nPlanes <= 62,
      s"nPlanes must be in [1, 62] (one bit per plane in a long): $nPlanes")
    val planes = hyperplanes(nPlanes, dim)
    val bits: Seq[Column] = planes.zipWithIndex.toSeq.map { case (plane, p) =>
      val proj = aggregate(
        zip_with(vecCol, typedLit(plane.toSeq), (x, y) => x.cast("double") * y),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _).as("bucket")
  }

  /** Deterministic IVF "centroids": unit-less pseudo-random direction
    * vectors seeded by (cell, coordinate). A real deployment would k-means
    * them; the partition/probe shape — the part that matters at scale — is
    * identical. */
  def ivfCentroids(nCells: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nCells, dim) { (c, d) =>
      ((ImageCodec.mix64((c.toLong << 32) | (d.toLong + 0x10000L)) & 0xffff) / 32768.0) - 1.0
    }

  /** Nearest-centroid cell id (argmax dot product over the literal centroid
    * table — codegen'd, no UDF, no shuffle). */
  def ivfCell(vecCol: Column, nCells: Int, dim: Int): Column = {
    require(nCells >= 1, s"nCells must be positive: $nCells")
    if (nCells == 1) return lit(0) // greatest() needs >= 2 args
    val cents = ivfCentroids(nCells, dim)
    val scored: Seq[Column] = cents.zipWithIndex.toSeq.map { case (cvec, i) =>
      struct(
        aggregate(zip_with(vecCol, typedLit(cvec.toSeq), (x, y) => x.cast("double") * y),
          lit(0.0), (acc, v) => acc + v).as("score"),
        lit(i).as("cell"))
    }
    greatest(scored: _*).getField("cell")
  }

  /** ANN top-k via IVF cells: each vector lands in its nearest-centroid
    * cell; candidates = same cell (single-probe), ranked by true cosine.
    * The inverted-file alternative to [[lshTopK]] — same bucket-join shape,
    * centroid-based partitioning instead of hyperplane signs. */
  def ivfTopK(vectors: DataFrame, idCol: String, vecCol: String,
              k: Int, nCells: Int, dim: Int): DataFrame = {
    val withCell = vectors.select(
      col(idCol), toDoubleArray(col(vecCol)).as("__v"),
      ivfCell(col(vecCol), nCells, dim).as("cell"))
    val l = withCell.select(col(idCol).as("query_id"), col("__v").as("__qv"), col("cell"))
    val r = withCell.select(col(idCol).as("neighbor_id"), col("__v").as("__cv"), col("cell"))
    val scored = l.join(r, Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("__qv"), col("__cv")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** ANN top-k via LSH buckets: candidates are restricted to the query's
    * bucket (plus the exact-dup check), then ranked by true cosine. Recall
    * is tunable via nPlanes; at 100 TB this is the path that avoids the
    * O(Q*N) scan. */
  def lshTopK(vectors: DataFrame, idCol: String, vecCol: String,
              k: Int, nPlanes: Int, dim: Int): DataFrame = {
    val withBucket = vectors.select(
      col(idCol), toDoubleArray(col(vecCol)).as("__v"),
      lshBucket(col(vecCol), nPlanes, dim))
    val l = withBucket.select(col(idCol).as("query_id"), col("__v").as("__qv"), col("bucket"))
    val r = withBucket.select(col(idCol).as("neighbor_id"), col("__v").as("__cv"), col("bucket"))
    val scored = l.join(r, Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("__qv"), col("__cv")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
