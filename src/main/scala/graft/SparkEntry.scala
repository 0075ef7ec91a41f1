package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query inventory maps 1:1 to SURVEY.md §2 operator families:
  *  - CoreQueries  : scans/aggregates (S1, P1, A1-A6, A8, skew salting)
  *  - JoinQueries  : J1 as-of, J2 range, J5 pair, J6 broadcast, O7 semi/anti
  *  - WindowQueries: W1-W10 ordered per-entity analytics, A7 scan, A12 runs
  *  - ShapeQueries : A3 pivot, O1 ref-sort, W6 resample, F1 JSON, O5 dedup
  *  - TextQueries  : dedup/fingerprint/langid/quality/jaccard (pipeline ops)
  *  - VectorQueries: embedding cosine top-k + norms
  *  - EngineQueries: MinHash/SimHash/LSH, multimodal payload legs,
  *    lineage, quality gates, curation funnel (DuckDB-oracled via
  *    `__SYNTH_DIR__` byte replay and the SqlHash FNV-1a replay; since
  *    round 5 every battery entry carries a full oracle — q56 included,
  *    via the canonical scaled-BIGINT digest encoding)
  */
object SparkEntry {

  /** Flagship query: the musif-analog feature pipeline (as-of join + lag +
    * sessionize + windowed feature vectors) on a small synthesized
    * image+caption table. Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    pipeline.FeaturePipeline.runSynthetic(spark, 2000, 16)

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ JoinQueries.queries ++ WindowQueries.queries ++
      ShapeQueries.queries ++ TheoryQueries.queries ++ TextQueries.queries ++
      VectorQueries.queries ++ CompositeQueries.queries ++
      FlagshipQueries.queries ++ EngineQueries.queries

  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ JoinQueries.oracles ++ WindowQueries.oracles ++
      ShapeQueries.oracles ++ TheoryQueries.oracles ++ TextQueries.oracles ++
      VectorQueries.oracles ++ CompositeQueries.oracles ++
      FlagshipQueries.oracles ++ EngineQueries.oracles
}
