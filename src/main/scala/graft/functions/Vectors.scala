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
    // norms computed ONCE per row, not once per pair (identical arithmetic
    // — sqrt(dot(v,v)) — so cos values are bit-identical to cosine())
    val q = queries.select(col(idCol).as("query_id"), toDoubleArray(col(vecCol)).as("__qv"))
      .withColumn("__qn", norm(col("__qv")))
    val c = candidates.select(col(idCol).as("neighbor_id"), toDoubleArray(col(vecCol)).as("__cv"))
      .withColumn("__cn", norm(col("__cv")))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), pairCos.as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Pair cosine from precomputed per-row norms `__qn`/`__cn` — the exact
    * arithmetic of [[cosine]] with the two sqrt(dot(v,v)) terms hoisted. */
  private def pairCos: Column = {
    val nn = col("__qn") * col("__cn")
    when(nn =!= 0.0, dot(col("__qv"), col("__cv")) / nn).otherwise(lit(0.0))
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

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  /** Cross-engine sign planes: sign(p, d) = parity of the first hex nibble
    * of md5("plane:p:d") — reproducible by any engine with an md5(), which
    * is what lets a DuckDB oracle replay the FULL sign-LSH pipeline
    * (bucketing, multiprobe, candidate formation, ranking) bit-for-bit
    * (q104). The production path keeps [[hyperplanes]] (mix64: no MD5 cost
    * at plan build, and the plane count there scales with the corpus). */
  def md5SignPlanes(nPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes, dim) { (p, d) =>
      if (Integer.parseInt(md5Hex(s"plane:$p:$d").substring(0, 1), 16) % 2 == 0)
        1.0 else -1.0
    }

  /** Cross-engine IVF centroids: coordinate (c, d) from the first 12 bits
    * of md5("cent:c:d"), mapped to [-1, 1) by an exact power-of-two divide
    * so both engines hold the identical double. The q105 oracle replays
    * cell assignment + multiprobe + ranking from these; production uses
    * [[trainCentroids]] (real Lloyd) or [[ivfCentroids]] (zero-cost). */
  def md5Centroids(nCells: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nCells, dim) { (c, d) =>
      Integer.parseInt(md5Hex(s"cent:$c:$d").substring(0, 3), 16) / 2048.0 - 1.0
    }

  /** Sign-LSH bucket id: one bit per hyperplane. Vectors in the same bucket
    * are ANN candidates; join on bucket replaces the cross product.
    * `planes` overrides the default mix64 hyperplanes (cross-engine mirrors
    * pass [[md5SignPlanes]]); must be nPlanes x dim when given. */
  def lshBucket(vecCol: Column, nPlanes: Int, dim: Int,
                planes0: Option[Array[Array[Double]]] = None): Column = {
    require(nPlanes >= 1 && nPlanes <= 62,
      s"nPlanes must be in [1, 62] (one bit per plane in a long): $nPlanes")
    planes0.foreach(p => require(p.length == nPlanes && p.forall(_.length == dim),
      s"planes must be $nPlanes x $dim"))
    val planes = planes0.getOrElse(hyperplanes(nPlanes, dim))
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

  // -------------------------------------------------- scale-honest sizing

  /** Hyperplane count scaled to the corpus: buckets ~ n / targetBucketSize,
    * so within-bucket candidate work stays O(n * targetBucketSize) instead
    * of O(n^2 / constant). Clamped to [4, 20] (one bit per plane). */
  def planesForCorpus(n: Long, targetBucketSize: Int = 64): Int = {
    require(targetBucketSize > 0, s"targetBucketSize must be positive: $targetBucketSize")
    val buckets = math.max(2.0, n.toDouble / targetBucketSize)
    math.min(20, math.max(4, math.ceil(math.log(buckets) / math.log(2.0)).toInt))
  }

  /** IVF cell count scaled to the corpus (~ n / targetCellSize). Capped at
    * 1024 because cell assignment is O(nCells * dim) per row with literal
    * centroids; a production deployment would train centroids and assign
    * via a BLAS GEMM, keeping the same bucket-join shape. */
  def cellsForCorpus(n: Long, targetCellSize: Int = 256): Int = {
    require(targetCellSize > 0, s"targetCellSize must be positive: $targetCellSize")
    math.min(1024, math.max(2, math.ceil(n.toDouble / targetCellSize).toInt))
  }

  /** Big-bucket split: rows whose bucket exceeds `cap` are salted into
    * ceil(size/cap) sub-buckets keyed on xxhash64(id). Joining on
    * (bucket, __salt) then bounds per-group fan-out at ~cap regardless of
    * skew — a degenerate bucket (boilerplate dups, identical vectors) costs
    * O(size * cap) instead of O(size^2). `sizes` defaults to df's own bucket
    * histogram; pass the BUILD side's histogram when salting a probe side so
    * both sides agree on each bucket's split factor.
    *
    * NOTE: each row gets exactly ONE salt from its own id — on a probe side
    * this is SAMPLING, not replication: inside an over-cap bucket a query
    * meets only ~1/ceil(size/cap) of that bucket's candidates (recall-gated
    * for the identical-vector skew case in VectorsSpec). When full recall
    * within an over-cap bucket is required, replicate the probe instead
    * ([[explodeProbeSalts]]) at O(size/cap) probe fan-out. */
  def saltBuckets(df: DataFrame, bucketCol: String, idCol: String, cap: Int,
                  sizes: Option[DataFrame] = None,
                  broadcastSizes: Boolean = false): DataFrame = {
    require(cap > 0, s"cap must be positive: $cap")
    val szDf0 = sizes.getOrElse(
      df.groupBy(col(bucketCol)).agg(count(lit(1)).as("__bsz")))
    // the sign-LSH/IVF bucket domain is bounded (2^nPlanes <= 1M cells /
    // nCells <= 1024), so the histogram broadcasts and the salting stays
    // narrow; text band-hash buckets are UNbounded (distinct buckets grow
    // with the corpus) and must keep the shuffle join — caller's choice
    val szDf = if (broadcastSizes) broadcast(szDf0) else szDf0
    df.join(szDf, Seq(bucketCol))
      .withColumn("__salt",
        pmod(xxhash64(col(idCol)),
          greatest(lit(1L), ceil(col("__bsz") / lit(cap.toDouble))).cast("long")).cast("int"))
      .drop("__bsz")
  }

  /** Per-bucket size histogram (shared between build and probe salting). */
  def bucketSizes(df: DataFrame, bucketCol: String): DataFrame =
    df.groupBy(col(bucketCol)).agg(count(lit(1)).as("__bsz"))

  /** Probe-side salt REPLICATION (vs [[saltBuckets]]' sampling): each probe
    * row is emitted once per sub-bucket salt of its bucket, so after joining
    * on (bucket, __salt) it meets EVERY build row of the bucket — full
    * within-bucket recall at O(ceil(size/cap)) probe fan-out, which is
    * bounded and linear in the bucket's size. `sizes` must be the BUILD
    * side's histogram (the side being matched against). */
  def explodeProbeSalts(df: DataFrame, bucketCol: String, cap: Int,
                        sizes: DataFrame,
                        broadcastSizes: Boolean = true): DataFrame = {
    require(cap > 0, s"cap must be positive: $cap")
    val szDf = if (broadcastSizes) broadcast(sizes) else sizes
    df.join(szDf, Seq(bucketCol))
      .withColumn("__salt",
        explode(sequence(lit(0),
          (greatest(lit(1L), ceil(col("__bsz") / lit(cap.toDouble)))
            .cast("long") - 1).cast("int"))))
      .drop("__bsz")
  }

  /** Deterministic spherical k-means (Lloyd) over a hash-ordered sample —
    * REAL centroid training for the IVF path (the pseudo-random
    * [[ivfCentroids]] are the zero-cost fallback). Points and centroids are
    * unit-normalized and assignment is max dot product, matching how
    * [[ivfTopK]] scores cells. The sample is bounded (driver-side Lloyd on
    * <= sampleN vectors — the standard sample-train-broadcast shape; at
    * 100 TB the sample is still sampleN rows) and ordered by xxhash64(id),
    * so training is reproducible at any parallelism. */
  def trainCentroids(vectors: DataFrame, idCol: String, vecCol: String,
                     k: Int, dim: Int, iters: Int = 4,
                     sampleN: Int = 4096): Array[Array[Double]] = {
    require(k >= 2 && iters >= 1 && sampleN >= k,
      s"need k >= 2, iters >= 1, sampleN >= k: $k/$iters/$sampleN")
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0.0) v else v.map(_ / n)
    }
    val pts = vectors
      .select(col(idCol).as("__id"), toDoubleArray(col(vecCol)).as("__v"))
      .orderBy(xxhash64(col("__id")))
      .limit(sampleN)
      .collect().map(r => normalize(r.getSeq[Double](1).toArray))
    // the TABLE may hold fewer than k rows even when sampleN >= k (tiny or
    // empty corpora, where cellsForCorpus(n) can exceed n) — a short init
    // array would crash the Lloyd loop below
    require(pts.length >= k,
      s"cannot train $k centroids from ${pts.length} sampled vectors — " +
        "the corpus has fewer rows than k; lower k (e.g. cellsForCorpus)")
    var cents = pts.take(k).map(_.clone) // hash-ordered sample => spread init
    (1 to iters).foreach { _ =>
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      pts.foreach { p =>
        var best = 0; var bestDot = Double.MinValue
        var c = 0
        while (c < k) {
          var d = 0.0; var i = 0
          while (i < dim) { d += p(i) * cents(c)(i); i += 1 }
          if (d > bestDot) { bestDot = d; best = c }
          c += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += p(i); i += 1 }
        counts(best) += 1
      }
      cents = Array.tabulate(k)(c =>
        if (counts(c) == 0) cents(c) // empty cell keeps its centroid
        else normalize(sums(c).map(_ / counts(c))))
    }
    cents
  }

  /** Centroid scores best-first: array of (score, cell) structs sorted by
    * score descending — element 1 is the nearest cell, a prefix slice is the
    * multiprobe set. Centroids ride ONE array literal evaluated by a
    * codegen'd HOF loop (no when-chain explosion at large nCells). */
  private def cellsRanked(vec: Column, nCells: Int, dim: Int,
                          centroids: Option[Array[Array[Double]]]): Column = {
    val cents = typedLit(
      centroids.getOrElse(ivfCentroids(nCells, dim)).map(_.toSeq).toSeq)
    reverse(array_sort(transform(cents, (c, i) =>
      struct(
        aggregate(zip_with(vec, c, (x, y) => x * y), lit(0.0), (acc, v) => acc + v).as("score"),
        i.as("cell")))))
  }

  /** ANN top-k via IVF cells, scale-honest: candidates are the query's
    * `probes` nearest cells (multiprobe recovers recall lost at cell
    * boundaries), oversized cells are salt-split at `cap`, and results are
    * ranked by true cosine. Candidate work per query is O(probes * cap) —
    * linear in corpus size overall, never quadratic-in-N. */
  def ivfTopK(vectors: DataFrame, idCol: String, vecCol: String,
              k: Int, nCells: Int, dim: Int,
              cap: Int = 1024, probes: Int = 2,
              centroids: Option[Array[Array[Double]]] = None,
              queries: Option[DataFrame] = None): DataFrame = {
    require(nCells >= 2, s"nCells must be >= 2: $nCells")
    require(probes >= 1 && probes <= nCells, s"probes must be in [1, $nCells]: $probes")
    centroids.foreach(c => require(c.length == nCells && c.forall(_.length == dim),
      s"centroids must be $nCells x $dim"))
    def ranked(df: DataFrame) = df.select(
      col(idCol), toDoubleArray(col(vecCol)).as("__v"),
      cellsRanked(toDoubleArray(col(vecCol)), nCells, dim, centroids).as("__ranked"))
      .withColumn("__n", norm(col("__v")))
    val buildRanked = ranked(vectors)
    val build0 = buildRanked
      .withColumn("cell", element_at(col("__ranked"), 1).getField("cell"))
      .drop("__ranked")
    val sizes = bucketSizes(build0, "cell")
    val build = saltBuckets(build0, "cell", idCol, cap, Some(sizes), broadcastSizes = true)
      .select(col("cell"), col("__salt"), col(idCol).as("neighbor_id"),
        col("__v").as("__cv"), col("__n").as("__cn"))
    // explicit probe set (the production query-set-vs-corpus shape) avoids
    // multiprobe-exploding the whole corpus when only a few rows query
    val probe0 = queries.map(ranked).getOrElse(buildRanked)
      .withColumn("cell",
        explode(transform(slice(col("__ranked"), 1, probes), _.getField("cell"))))
      .drop("__ranked")
    val probe = saltBuckets(probe0, "cell", idCol, cap, Some(sizes), broadcastSizes = true)
      .select(col("cell"), col("__salt"), col(idCol).as("query_id"),
        col("__v").as("__qv"), col("__n").as("__qn"))
    rankCandidates(probe.join(build, Seq("cell", "__salt")), k)
  }

  /** ANN top-k via sign-LSH, scale-honest: the plane count should come from
    * [[planesForCorpus]] so bucket count tracks corpus size; queries probe
    * their own bucket plus every hamming-1 neighbor (multiprobe — recovers
    * vectors that land one sign-flip away); oversized buckets (identical
    * vectors) are salt-split at `cap`. Per-query candidate work is
    * O((nPlanes+1) * cap); total work is linear in N. */
  def lshTopK(vectors: DataFrame, idCol: String, vecCol: String,
              k: Int, nPlanes: Int, dim: Int,
              cap: Int = 1024, multiprobe: Boolean = true,
              queries: Option[DataFrame] = None,
              planes: Option[Array[Array[Double]]] = None): DataFrame = {
    def bucketed(df: DataFrame) = df.select(
      col(idCol), toDoubleArray(col(vecCol)).as("__v"),
      lshBucket(col(vecCol), nPlanes, dim, planes))
      .withColumn("__n", norm(col("__v")))
    val withBucket = bucketed(vectors)
    val sizes = bucketSizes(withBucket.select(col(idCol), col("bucket")), "bucket")
    val build = saltBuckets(withBucket, "bucket", idCol, cap, Some(sizes), broadcastSizes = true)
      .select(col("bucket"), col("__salt"), col(idCol).as("neighbor_id"),
        col("__v").as("__cv"), col("__n").as("__cn"))
    val probeBuckets =
      if (multiprobe)
        array((col("bucket") +: (0 until nPlanes).map(p =>
          col("bucket").bitwiseXOR(lit(1L << p)))): _*)
      else array(col("bucket"))
    // explicit probe set (query-set-vs-corpus) keeps the hamming-1 explode
    // proportional to |queries|, not |corpus|; inner join against the build
    // histogram drops probes into empty buckets either way
    val probe = saltBuckets(
        queries.map(bucketed).getOrElse(withBucket)
          .withColumn("bucket", explode(probeBuckets)),
        "bucket", idCol, cap, Some(sizes), broadcastSizes = true)
      .select(col("bucket"), col("__salt"), col(idCol).as("query_id"),
        col("__v").as("__qv"), col("__n").as("__qn"))
    rankCandidates(probe.join(build, Seq("bucket", "__salt")), k)
  }

  /** Score candidate pairs by true cosine, dedupe pairs surfaced by several
    * probe buckets (slim (q, n, cos) triple — vectors never re-shuffle), and
    * keep each query's top-k. */
  private def rankCandidates(cand: DataFrame, k: Int): DataFrame = {
    val scored = cand
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), pairCos.as("cos"))
      .distinct()
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
