package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.AsOfJoin
import graft.sources.SynthImages

/** The flagship musif-analog query: per-entity x time-window feature
  * extraction with point-in-time label alignment, over the image+caption
  * table (BASELINE.json input_hint).
  *
  * Mirrors `FeaturesExtractor.extract()`
  * (`/root/reference/musif/extract/extract.py:255-311`): per-entity ordered
  * stream -> as-of label join (scale_relative semantics) -> pluggable
  * feature modules in dependency order (`extract.py:689-724`) -> tumbling
  * window aggregation into one wide feature row per (entity, window).
  *
  * Shuffle budget: ONE exchange by entity feeds the as-of union-window, all
  * module window functions, and the sessionization (alias-aware partitioning
  * propagates through the as-of output, so Catalyst reuses the exchange);
  * the final groupBy(entity, window) reuses it too (partitioning by entity
  * clusters (entity, window)). Asserted in PlanSpec.
  */
object FeaturePipeline {

  val WindowDuration = "10 minutes"
  val SessionGapSeconds = 3600L

  /** Stage 1 (pre-shuffle, narrow): per-row pure module features, then prune
    * the heavy payload columns — the entity exchange moves derived features
    * (~80 B/row), not raw bytes/captions. At 100 TB this is the difference
    * between shuffling the corpus and shuffling a feature table. Exposed so
    * Verify can materialize EXACTLY the table the pipeline shuffles (the
    * DuckDB flagship oracle mirrors everything above this cut). */
  def prepareSlim(images: DataFrame,
                  modules: Seq[FeatureModule] = FeatureModules.All): DataFrame = {
    val prepared = modules.foldLeft(images)((df, m) => m.prepare(df))
    val keep = (Seq("phash", "ts", "image_id") ++
      modules.flatMap(_.preparedCols) ++ modules.flatMap(_.rawCols)).distinct
    prepared.select(keep.map(col): _*)
  }

  /** Row-level enriched stream: as-of label + module enrichment columns.
    * Kept separate from the aggregation so tests can assert row-level
    * leakage-freedom. */
  def enrich(images: DataFrame, labels: DataFrame,
             modules: Seq[FeatureModule] = FeatureModules.All,
             useMergeExec: Boolean = true,
             preHooks: Seq[DataFrame => DataFrame] = Nil): DataFrame = {
    // Stage 0: user pre-pipeline hooks — musif's `precache_hooks`
    // (`extract/extract.py:613-617`): arbitrary DataFrame => DataFrame
    // transforms over the validated input BEFORE any module sees it
    // (filtering, payload normalization, column rewrites). Narrow unless
    // the user shuffles; runs below the payload prune so hooks still see
    // the raw bytes/caption columns.
    val hooked = preHooks.foldLeft(images)((df, h) => h(df))
    val slim = prepareSlim(hooked, modules)

    // Stage 2: the as-of label join. Default = the custom AsOfMergeJoinExec
    // (single forward merge, ~25% faster than the union+window formulation,
    // sorts each side separately); both verified equivalent in
    // AsOfMergeJoinSpec. Flip the flag to run on pure built-ins.
    val withLabel =
      if (useMergeExec)
        AsOfJoin.asOfSortMerge(slim, labels,
          entityCol = "phash", probeTs = "ts", buildTs = "label_ts",
          payloadCols = Seq("label", "weight"))
      else
        AsOfJoin.asOf(slim, labels,
          entityCol = "phash", probeTs = "ts", buildTs = "label_ts",
          payloadCols = Seq("label", "weight"))

    // Stage 3 (post-shuffle): order-dependent columns over the
    // entity-partitioned stream (lag, sessions) — exchange reused.
    modules.foldLeft(withLabel)((df, m) => m.enrich(df, Seq("phash")))
  }

  /** One wide feature row per (entity, tumbling window) from the requested
    * module set (dependencies pulled in automatically, topological order). */
  def features(images: DataFrame, labels: DataFrame,
               moduleNames: Seq[String]): DataFrame = {
    val modules = FeatureModules.resolve(moduleNames)
    val enriched = enrich(images, labels, modules)
    val aggs: Seq[Column] = modules.flatMap(_.aggregates)
    require(aggs.nonEmpty, "no aggregates from requested modules")
    enriched
      .groupBy(col("phash").as("entity"),
        window(col("ts"), WindowDuration).getField("start").as("window_start"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** All modules — the full flagship feature vector. */
  def features(images: DataFrame, labels: DataFrame): DataFrame =
    features(images, labels, FeatureModules.All.map(_.name))

  /** Config-driven variant (GraftConfig = musif's layered configuration;
    * the session gap is a module-level constant — override by supplying a
    * custom session module). */
  def features(images: DataFrame, labels: DataFrame, cfg: GraftConfig): DataFrame = {
    // substitute the config-gap session module so session_gap_seconds binds
    val available = FeatureModules.All.map {
      case FeatureModules.SessionModule =>
        FeatureModules.SessionModuleWithGap(cfg.sessionGapSeconds)
      case m => m
    }
    val modules = FeatureModules.resolve(cfg.modules, available)
    val enriched = enrich(images, labels, modules, cfg.useMergeExec, cfg.preHooks)
    val aggs: Seq[Column] = modules.flatMap(_.aggregates)
    require(aggs.nonEmpty, "no aggregates from requested modules")
    enriched
      .groupBy(col("phash").as("entity"),
        window(col("ts"), cfg.windowDuration).getField("start").as("window_start"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** musif's native windowed mode (W2): feature row per sliding window of
    * `size` events with `overlap` per entity, hop = size - overlap —
    * `number_windows = (n - overlap) // hop`
    * (`/root/reference/musif/extract/extract.py:416-464`). The event
    * sequence axis (row_number per entity) stands in for measure numbers;
    * rows belonging to several windows are exploded (generator shape, no
    * extra shuffle — the groupBy reuses the entity partitioning).
    * Emits `window_id` and `window_range` like the reference's
    * WindowId/WindowRange columns. */
  def featuresSliding(images: DataFrame, labels: DataFrame,
                      size: Int, overlap: Int,
                      moduleNames: Seq[String] = FeatureModules.All.map(_.name)): DataFrame = {
    require(size > overlap && overlap >= 0, s"need size > overlap >= 0, got $size/$overlap")
    val modules = FeatureModules.resolve(moduleNames)
    val hop = size - overlap

    // prepare + prune + as-of label join (entity-partitioned), NO module
    // window enrichment yet — order-dependent state must not cross window
    // boundaries, so enrichment runs per (entity, window) after the explode
    val withLabel = AsOfJoin.asOfSortMerge(
      prepareSlim(images, modules), labels,
      entityCol = "phash", probeTs = "ts", buildTs = "label_ts",
      payloadCols = Seq("label", "weight"))

    val wEnt = org.apache.spark.sql.expressions.Window
      .partitionBy(col("phash")).orderBy(col("ts"), col("image_id"))
    val wCnt = org.apache.spark.sql.expressions.Window.partitionBy(col("phash"))
    val seqd = withLabel
      .withColumn("__seq", (row_number().over(wEnt) - 1).cast("long"))
      .withColumn("__n", count(lit(1)).over(wCnt))

    // musif's window count: number_windows = (n - overlap) // hop — trailing
    // partial windows are NOT emitted (`extract/extract.py:429-431`); since
    // size = hop + overlap every emitted window holds exactly `size` rows
    // Column `/` is double division — floor() matches Python's // exactly
    val nWindows = greatest(
      floor((col("__n") - overlap).cast("double") / hop).cast("long"), lit(0L))
    val exploded = graft.ops.WindowOps.slidingWindowIds(seqd, "__seq", size, overlap)
      .where(col("window_id") < nWindows)

    // per-(entity, window) enrichment: lag/session state scoped to the slice
    val enriched = modules.foldLeft(exploded)((df, m) =>
      m.enrich(df, Seq("phash", "window_id")))

    val aggs: Seq[Column] = modules.flatMap(_.aggregates)
    require(aggs.nonEmpty, "no aggregates from requested modules")
    enriched
      .groupBy(col("phash").as("entity"), col("window_id"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_range",
        concat(lit("["), col("window_id") * hop, lit(", "),
          col("window_id") * hop + size, lit(")")))
  }

  /** Convenience entry over synthesized data. */
  def runSynthetic(spark: org.apache.spark.sql.SparkSession, nRows: Long,
                   nEntities: Int = 64,
                   hotExtraFraction: Double = 1.0 / 16): DataFrame = {
    val imgs = SynthImages.images(spark, nRows, nEntities, hotExtraFraction)
    val lbls = SynthImages.labels(spark, nRows, nEntities)
    features(imgs, lbls)
  }

  /** The synthesized prepared-slim table the flagship pipeline shuffles —
    * materialized by Verify so the DuckDB oracle can mirror every stage
    * ABOVE the per-row prepare cut (as-of join, lag, sessionize, tumbling
    * windows, aggregates, group_columns). Deterministic: identical content
    * to what [[runSynthetic]] computes internally at the same params. */
  def preparedSynthetic(spark: org.apache.spark.sql.SparkSession, nRows: Long,
                        nEntities: Int = 64,
                        hotExtraFraction: Double = 1.0 / 16): DataFrame =
    prepareSlim(SynthImages.images(spark, nRows, nEntities, hotExtraFraction),
      FeatureModules.All)
}
