package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.Vectors
import Q._

/** Embedding similarity family over `embeddings`: brute-force cosine top-k
  * (exact baseline) + per-label norm stats. Dot products run in array order
  * via codegen'd higher-order functions on both engines, so doubles agree. */
object VectorQueries {

  val queries: Map[String, QueryFn] = Map(
    "q40_cosine_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Vectors.bruteForceTopK(emb.where(col("vec_id") < 5), emb, "vec_id", "embedding", 10)
        .select(col("query_id"), col("neighbor_id"),
          col("rank").cast("long").as("rank"), r6(col("cos")).as("cos"))
    }),

    // embedding-cosine near-dup: exact bounded baseline (brute-force pairs
    // at cos >= 0.9 with injected perturbed dups; organic pairs max ~0.50 on
    // this corpus) — the scale path is Vectors.lshTopK, recall-gated in
    // VectorsSpec; this query pins the SEMANTICS against DuckDB's
    // list_cosine_similarity
    "q45_embedding_near_dup" -> ((s, dir) => {
      val v = t(s, dir, "embeddings").where(col("vec_id") < 400)
        .select(col("vec_id"), Vectors.toDoubleArray(col("embedding")).as("e"))
      val dups = v.where(pmod(col("vec_id"), lit(20)) === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          transform(col("e"), (x, i) => when(i === 0, x + 0.05).otherwise(x)).as("e"))
      // norms hoisted to once-per-row (identical arithmetic to cosine(),
      // so values stay bit-identical to the DuckDB oracle at r6)
      val all = v.unionByName(dups).withColumn("nrm", Vectors.norm(col("e")))
      val a = all.select(col("vec_id").as("v1"), col("e").as("e1"), col("nrm").as("n1"))
      val b = all.select(col("vec_id").as("v2"), col("e").as("e2"), col("nrm").as("n2"))
      a.join(broadcast(b), col("v1") < col("v2"))
        .select(col("v1"), col("v2"),
          when(col("n1") * col("n2") =!= 0.0,
            Vectors.dot(col("e1"), col("e2")) / (col("n1") * col("n2")))
            .otherwise(lit(0.0)).as("cos"))
        .where(col("cos") >= 0.9)
        .select(col("v1"), col("v2"), r6(col("cos")).as("cos"))
    }),

    // ANN correctness in the DRIVER gate (not only ScalaTest): plant a
    // near-identical copy (+0.001 on one coordinate, cos ~ 1-1e-7 vs <= ~0.5
    // organic) of every 20th vector, run the sign-LSH scale path over the
    // full corpus, and emit each planted query's rank-1 neighbor. The oracle
    // computes the EXACT top-1 by full cross product (feasible DuckDB-side
    // only) — by the cosine margin that is always the planted source, so any
    // LSH recall miss or ranking drift hash-fails the round. Deterministic
    // for the fixed corpus + fixed hyperplanes: a near-identical pair
    // separates only if >= 2 planes flip AND no hamming-1 probe recovers it.
    // (Organic low-cos top-1s are NOT a meaningful LSH gate — sign-LSH at
    // ~0.3 cosine has per-bucket collision odds near chance; recall there is
    // covered by VectorsSpec's threshold-recall gates.)
    "q62_lsh_recall" -> ((s, dir) => {
      val base = t(s, dir, "embeddings")
        .select(col("vec_id"), Vectors.toDoubleArray(col("embedding")).as("embedding"))
      val dups = base.where(pmod(col("vec_id"), lit(20)) === 0 && col("vec_id") < 500)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          transform(col("embedding"),
            (x, i) => when(i === 0, x + 0.001).otherwise(x)).as("embedding"))
      val all = base.unionByName(dups)
      val n = graft.sources.TableSource.parquetRowCount(s, s"$dir/embeddings.parquet")
      // probe ONLY the planted queries (query-set-vs-corpus shape): the
      // hamming-1 multiprobe explode and the rank window cover 25 rows, not
      // the whole corpus, while the build side still indexes every vector
      Vectors.lshTopK(all, "vec_id", "embedding",
          k = 5, nPlanes = Vectors.planesForCorpus(n), dim = 64, cap = 512,
          queries = Some(dups))
        .where(col("rank") === 1)
        .select((col("query_id") - 1000000L).as("query_id"),
          col("neighbor_id"), r6(col("cos")).as("cos"))
    }),

    // IVF twin of q62: the planted near-identical pairs must also surface
    // as rank-1 through the trained-centroid IVF path (2-probe multiprobe
    // covers cell-boundary splits). Same exact-top-1 oracle — the exact
    // answer is ANN-method independent.
    "q64_ivf_recall" -> ((s, dir) => {
      val base = t(s, dir, "embeddings")
        .select(col("vec_id"), Vectors.toDoubleArray(col("embedding")).as("embedding"))
      val dups = base.where(pmod(col("vec_id"), lit(20)) === 0 && col("vec_id") < 500)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          transform(col("embedding"),
            (x, i) => when(i === 0, x + 0.001).otherwise(x)).as("embedding"))
      val all = base.unionByName(dups)
      val n = graft.sources.TableSource.parquetRowCount(s, s"$dir/embeddings.parquet")
      val nCells = Vectors.cellsForCorpus(n)
      val cents = Vectors.trainCentroids(all, "vec_id", "embedding",
        k = nCells, dim = 64, iters = 3, sampleN = 2048)
      Vectors.ivfTopK(all, "vec_id", "embedding",
          k = 5, nCells = nCells, dim = 64, cap = 512, probes = 2,
          centroids = Some(cents), queries = Some(dups))
        .where(col("rank") === 1)
        .select((col("query_id") - 1000000L).as("query_id"),
          col("neighbor_id"), r6(col("cos")).as("cos"))
    }),

    // ANN RANKING cross-engine gate for the sign-LSH path (q62 gates recall
    // only; this oracles the full top-k ORDER): the identical lshTopK
    // pipeline with md5-derived sign planes so DuckDB can replay every
    // stage — per-vector bucket bits, the hamming-1 multiprobe set, the
    // bucket-join candidate formation, true-cosine scoring, and the
    // (cos DESC, neighbor_id) rank — over the same embeddings table.
    // nPlanes fixed at 6 for the mirror (the production q57 scales planes
    // from parquet-footer corpus stats); cap 4096 exceeds the corpus so
    // salting provably never splits a bucket and the oracle needn't model
    // it (salt = pmod(x, 1) = 0 for every row).
    "q104_lsh_ranking" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Vectors.lshTopK(emb, "vec_id", "embedding",
          k = 5, nPlanes = 6, dim = 64, cap = 4096,
          planes = Some(Vectors.md5SignPlanes(6, 64)),
          queries = Some(emb.where(col("vec_id") < 50)))
        .select(col("query_id"), col("neighbor_id"),
          col("rank").cast("long").as("rank"), r6(col("cos")).as("cos"))
    }),

    // ANN RANKING cross-engine gate for the IVF path (q64 gates recall
    // only): ivfTopK with md5-derived centroids — DuckDB re-derives the
    // same 8 x 64 centroid table, assigns each vector to its argmax-dot
    // cell (score DESC, cell DESC — cellsRanked's reverse(array_sort) tie
    // order), probes each query's top-2 cells, and ranks candidates by
    // true cosine. cap 4096 > corpus: salting never activates (see q104).
    "q105_ivf_ranking" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Vectors.ivfTopK(emb, "vec_id", "embedding",
          k = 5, nCells = 8, dim = 64, cap = 4096, probes = 2,
          centroids = Some(Vectors.md5Centroids(8, 64)),
          queries = Some(emb.where(col("vec_id") < 50)))
        .select(col("query_id"), col("neighbor_id"),
          col("rank").cast("long").as("rank"), r6(col("cos")).as("cos"))
    }),

    // Embedding-cosine dedup CLUSTERS — the third leg of the cluster-
    // formation triple (text MinHash q85, image aHash q95, embeddings
    // here): q45's exact bounded near-dup edges (cos >= 0.9 over the
    // corpus with injected perturbed copies) -> connected components ->
    // min-id representative + kept flag for EVERY vector. At scale the
    // edge stage swaps to lshTopK candidates (recall-gated in
    // VectorsSpec); the CC and keep-one-rep machinery is identical.
    "q111_embedding_dedup" -> ((s, dir) => {
      val v = t(s, dir, "embeddings").where(col("vec_id") < 400)
        .select(col("vec_id"), Vectors.toDoubleArray(col("embedding")).as("e"))
      val dups = v.where(pmod(col("vec_id"), lit(20)) === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          transform(col("e"), (x, i) => when(i === 0, x + 0.05).otherwise(x)).as("e"))
      val all = v.unionByName(dups).withColumn("nrm", Vectors.norm(col("e")))
      val a = all.select(col("vec_id").as("v1"), col("e").as("e1"), col("nrm").as("n1"))
      val b = all.select(col("vec_id").as("v2"), col("e").as("e2"), col("nrm").as("n2"))
      val edges = a.join(broadcast(b), col("v1") < col("v2"))
        .select(col("v1"), col("v2"),
          when(col("n1") * col("n2") =!= 0.0,
            Vectors.dot(col("e1"), col("e2")) / (col("n1") * col("n2")))
            .otherwise(lit(0.0)).as("cos"))
        .where(col("cos") >= 0.9)
        .select(col("v1").as("a"), col("v2").as("b"))
      val cc = graft.ops.Dedup.connectedComponents(edges)
        .withColumnRenamed("id", "vec_id")
      all.select(col("vec_id")).join(cc, Seq("vec_id"), "left")
        .select(col("vec_id"),
          coalesce(col("cluster_rep"), col("vec_id")).as("rep"),
          (coalesce(col("cluster_rep"), col("vec_id")) === col("vec_id")).as("kept"))
    }),

    "q41_vector_norms" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .select(col("label"), Vectors.norm(Vectors.toDoubleArray(col("embedding"))).as("nrm"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"), r6(avg(col("nrm"))).as("avg_norm"),
          r6(min(col("nrm"))).as("min_norm"), r6(max(col("nrm"))).as("max_norm"))
    }))

  val oracles: Map[String, String] = Map(
    "q40_cosine_topk" ->
      """WITH q AS (
        | SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        | FROM embeddings WHERE vec_id < 5),
        |s AS (
        | SELECT q.query_id, e.vec_id AS neighbor_id,
        |  list_cosine_similarity(q.qv, e.embedding::DOUBLE[]) AS cos
        | FROM q, embeddings e WHERE e.vec_id <> q.query_id),
        |r AS (
        | SELECT *, row_number() OVER (PARTITION BY query_id
        |   ORDER BY cos DESC, neighbor_id) AS rank FROM s)
        |SELECT query_id, neighbor_id, rank::BIGINT AS rank, round(cos + 3.7e-10, 6) AS cos
        |FROM r WHERE rank <= 10""".stripMargin,

    // DuckDB list_transform index is 1-based (Spark's is 0-based): i = 1
    // here perturbs the same first coordinate as i === 0 on the Spark side
    "q45_embedding_near_dup" ->
      """WITH v AS (
        | SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id < 400),
        |d AS (
        | SELECT vec_id + 1000000 AS vec_id,
        |  list_transform(e, (x, i) -> CASE WHEN i = 1 THEN x + 0.05 ELSE x END) AS e
        | FROM v WHERE vec_id % 20 = 0),
        |a AS (SELECT * FROM v UNION ALL SELECT * FROM d),
        |p AS (
        | SELECT x.vec_id AS v1, y.vec_id AS v2,
        |  list_cosine_similarity(x.e, y.e) AS cos
        | FROM a x JOIN a y ON x.vec_id < y.vec_id)
        |SELECT v1, v2, round(cos + 3.7e-10, 6) AS cos FROM p WHERE cos >= 0.9""".stripMargin,

    // DuckDB list_transform index is 1-based (Spark's is 0-based): i = 1
    // perturbs the same first coordinate as i === 0 on the Spark side
    "q62_lsh_recall" ->
      """WITH v AS (
        | SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |d AS (
        | SELECT vec_id + 1000000 AS vec_id,
        |  list_transform(e, (x, i) -> CASE WHEN i = 1 THEN x + 0.001 ELSE x END) AS e
        | FROM v WHERE vec_id % 20 = 0 AND vec_id < 500),
        |a AS (SELECT * FROM v UNION ALL SELECT * FROM d),
        |s AS (
        | SELECT q.vec_id AS qid, c.vec_id AS neighbor_id,
        |  list_cosine_similarity(q.e, c.e) AS cos
        | FROM d q JOIN a c ON c.vec_id <> q.vec_id),
        |r AS (
        | SELECT *, row_number() OVER (PARTITION BY qid
        |   ORDER BY cos DESC, neighbor_id) AS rnk FROM s)
        |SELECT qid - 1000000 AS query_id, neighbor_id, round(cos + 3.7e-10, 6) AS cos
        |FROM r WHERE rnk = 1""".stripMargin,

    "q64_ivf_recall" ->
      """WITH v AS (
        | SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |d AS (
        | SELECT vec_id + 1000000 AS vec_id,
        |  list_transform(e, (x, i) -> CASE WHEN i = 1 THEN x + 0.001 ELSE x END) AS e
        | FROM v WHERE vec_id % 20 = 0 AND vec_id < 500),
        |a AS (SELECT * FROM v UNION ALL SELECT * FROM d),
        |s AS (
        | SELECT q.vec_id AS qid, c.vec_id AS neighbor_id,
        |  list_cosine_similarity(q.e, c.e) AS cos
        | FROM d q JOIN a c ON c.vec_id <> q.vec_id),
        |r AS (
        | SELECT *, row_number() OVER (PARTITION BY qid
        |   ORDER BY cos DESC, neighbor_id) AS rnk FROM s)
        |SELECT qid - 1000000 AS query_id, neighbor_id, round(cos + 3.7e-10, 6) AS cos
        |FROM r WHERE rnk = 1""".stripMargin,

    // full sign-LSH replay: same md5 sign planes, same bucket bits, same
    // hamming-1 probe set, same (cos DESC, neighbor_id) ranking. A probe
    // bucket matches a build vector's single bucket at most once (own +
    // one-bit flips are pairwise distinct), so no dedup stage is needed —
    // mirroring rankCandidates' no-op distinct.
    "q104_lsh_ranking" ->
      """WITH v AS (
        | SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |b AS (
        | SELECT vec_id, e,
        |  list_sum([CASE WHEN list_sum([e[d + 1] *
        |      (CASE WHEN ('0x' || substr(md5('plane:' || p || ':' || d), 1, 1))::INT % 2 = 0
        |        THEN 1.0 ELSE -1.0 END)::DOUBLE
        |     for d in range(0, 64)]) >= 0
        |    THEN (1::BIGINT << p) ELSE 0::BIGINT END
        |   for p in range(0, 6)]) AS bucket
        | FROM v),
        |probe AS (
        | SELECT vec_id AS query_id, e AS qe,
        |  unnest([bucket] || [xor(bucket, (1::BIGINT << p)) for p in range(0, 6)]) AS pb
        | FROM b WHERE vec_id < 50),
        |s AS (
        | SELECT p.query_id, c.vec_id AS neighbor_id,
        |  list_cosine_similarity(p.qe, c.e) AS cos
        | FROM probe p JOIN b c ON c.bucket = p.pb AND c.vec_id <> p.query_id),
        |r AS (
        | SELECT *, row_number() OVER (PARTITION BY query_id
        |   ORDER BY cos DESC, neighbor_id) AS rank FROM s)
        |SELECT query_id, neighbor_id, rank::BIGINT AS rank,
        | round(cos + 3.7e-10, 6) AS cos
        |FROM r WHERE rank <= 5""".stripMargin,

    // full IVF replay: md5 centroid table, argmax-dot cell per vector
    // (score DESC, cell DESC tie order = cellsRanked's reversed struct
    // sort), top-2 probe cells per query, true-cosine ranking. The divide
    // by 2048 is a power of two, so both engines hold identical centroid
    // doubles.
    "q105_ivf_ranking" ->
      """WITH v AS (
        | SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |cents AS (
        | SELECT c, [(('0x' || substr(md5('cent:' || c || ':' || d), 1, 3))::INT
        |     / 2048.0 - 1.0)::DOUBLE for d in range(0, 64)] AS cv
        | FROM range(0, 8) t(c)),
        |sc AS (
        | SELECT v.vec_id, v.e, cents.c,
        |  list_sum([e[d + 1] * cv[d + 1] for d in range(0, 64)]) AS score
        | FROM v CROSS JOIN cents),
        |rk AS (
        | SELECT *, row_number() OVER (PARTITION BY vec_id
        |   ORDER BY score DESC, c DESC) AS cr FROM sc),
        |build AS (SELECT vec_id, e, c AS cell FROM rk WHERE cr = 1),
        |probe AS (
        | SELECT vec_id AS query_id, e AS qe, c AS cell
        | FROM rk WHERE cr <= 2 AND vec_id < 50),
        |s AS (
        | SELECT p.query_id, b.vec_id AS neighbor_id,
        |  list_cosine_similarity(p.qe, b.e) AS cos
        | FROM probe p JOIN build b ON b.cell = p.cell AND b.vec_id <> p.query_id),
        |r AS (
        | SELECT *, row_number() OVER (PARTITION BY query_id
        |   ORDER BY cos DESC, neighbor_id) AS rank FROM s)
        |SELECT query_id, neighbor_id, rank::BIGINT AS rank,
        | round(cos + 3.7e-10, 6) AS cos
        |FROM r WHERE rank <= 5""".stripMargin,

    // q45's edge derivation + the q95-pattern recursive-CTE closure:
    // min-reachable-id labels over the symmetrized cos >= 0.9 edge set,
    // kept = vector is its own cluster representative
    "q111_embedding_dedup" ->
      """WITH RECURSIVE v AS (
        | SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id < 400),
        |d AS (
        | SELECT vec_id + 1000000 AS vec_id,
        |  list_transform(e, (x, i) -> CASE WHEN i = 1 THEN x + 0.05 ELSE x END) AS e
        | FROM v WHERE vec_id % 20 = 0),
        |a AS (SELECT * FROM v UNION ALL SELECT * FROM d),
        |p AS (
        | SELECT x.vec_id AS v1, y.vec_id AS v2
        | FROM a x JOIN a y ON x.vec_id < y.vec_id
        | WHERE list_cosine_similarity(x.e, y.e) >= 0.9),
        |sym AS (SELECT v1 AS s, v2 AS t FROM p
        |        UNION ALL SELECT v2 AS s, v1 AS t FROM p),
        |reach AS (
        | SELECT DISTINCT s AS id, s AS lbl FROM sym
        | UNION
        | SELECT y.s AS id, r.lbl FROM sym y JOIN reach r ON r.id = y.t),
        |lab AS (SELECT id, min(lbl) AS cluster_rep FROM reach GROUP BY id)
        |SELECT a.vec_id, coalesce(l.cluster_rep, a.vec_id) AS rep,
        | (coalesce(l.cluster_rep, a.vec_id) = a.vec_id) AS kept
        |FROM a LEFT JOIN lab l ON l.id = a.vec_id""".stripMargin,

    "q41_vector_norms" ->
      """WITH n AS (
        | SELECT label,
        |  sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
        | FROM embeddings)
        |SELECT label, count(*)::BIGINT AS n, round(avg(nrm) + 3.7e-10, 6) AS avg_norm,
        | round(min(nrm) + 3.7e-10, 6) AS min_norm, round(max(nrm) + 3.7e-10, 6) AS max_norm
        |FROM n GROUP BY label""".stripMargin)
}
