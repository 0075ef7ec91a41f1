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

    "q41_vector_norms" ->
      """WITH n AS (
        | SELECT label,
        |  sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
        | FROM embeddings)
        |SELECT label, count(*)::BIGINT AS n, round(avg(nrm) + 3.7e-10, 6) AS avg_norm,
        | round(min(nrm) + 3.7e-10, 6) AS min_norm, round(max(nrm) + 3.7e-10, 6) AS max_norm
        |FROM n GROUP BY label""".stripMargin)
}
