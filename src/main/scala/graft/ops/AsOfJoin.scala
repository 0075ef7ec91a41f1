package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join: for each probe row, attach the payload of the
  * most recent build row with `build.ts <= probe.ts` for the same entity —
  * zero temporal leakage by construction (the `<=` bound).
  *
  * Reference semantics: musif assigns each note the harmonic label of the
  * latest annotation at-or-before the note's beat
  * (`/root/reference/musif/extract/features/scale_relative/utils.py:47-73,100-135`).
  *
  * Spark-first formulation: union both sides tagged by kind, then
  * `last(payload, ignoreNulls) OVER (PARTITION BY entity ORDER BY ts, kind
  * ROWS UNBOUNDED PRECEDING)`. Build rows sort *before* probe rows at equal
  * ts (kind 0 < 1) so a label exactly at the probe ts is visible (`<=`, not
  * `<`). Cost shape is identical to a sort-merge join: ONE hash shuffle of
  * both sides by entity + one sort within partitions — no broadcast of
  * history, no range explosion, scales linearly with input at any entity
  * cardinality. Skewed entities are bounded by per-entity history length,
  * not by join fan-out (the window is a streaming scan within a partition).
  */
object AsOfJoin {

  /** @param probe        left/event side; all its columns are preserved
    * @param build        right/label side (sparse history)
    * @param entityCol    equi-key present on both sides
    * @param probeTs      event-time column on the probe side
    * @param buildTs      event-time column on the build side
    * @param payloadCols  build-side columns to attach (null when no label at
    *                     or before the probe ts exists — left-join semantics)
    * @param dedupeLatest when true, ties in (entity, buildTs) on the build
    *                     side are resolved deterministically by keeping the
    *                     row that is max by payload struct ordering
    */
  def asOf(
      probe: DataFrame,
      build: DataFrame,
      entityCol: String,
      probeTs: String,
      buildTs: String,
      payloadCols: Seq[String],
      dedupeLatest: Boolean = true): DataFrame = {

    val probeCols = probe.columns.toSeq

    // SQL as-of semantics: NULL keys/timestamps never match (DuckDB ASOF
    // parity) — drop them from the build side in both formulations
    val buildSel = build
      .where(col(entityCol).isNotNull && col(buildTs).isNotNull)
      .select(
        col(entityCol).cast(probe.schema(entityCol).dataType).as("__entity"),
        col(buildTs).cast(probe.schema(probeTs).dataType).as("__ts"),
        struct(payloadCols.map(col): _*).as("__payload"))

    // Deterministic tie-break among duplicate (entity, ts) labels: keep the
    // max payload struct (DuckDB ASOF oracle gets the same dedupe in a CTE).
    val buildDeduped =
      if (dedupeLatest)
        buildSel
          .groupBy(col("__entity"), col("__ts"))
          .agg(max(col("__payload")).as("__payload"))
      else buildSel

    val payloadType = buildDeduped.schema("__payload").dataType

    // entity/ts are NOT duplicated into the carry set: the output rebuilds
    // them from __entity/__ts, so Catalyst's alias-aware output partitioning
    // sees the result as hash-partitioned by the entity column — downstream
    // per-entity windows/aggregations reuse this exchange instead of
    // re-shuffling (one exchange feeds the whole enrichment stage).
    val carryCols = probeCols.filterNot(c => c == entityCol || c == probeTs)

    val probeSide = probe.select(
      col(entityCol).as("__entity") +:
        col(probeTs).as("__ts") +:
        lit(1).as("__kind") +:
        lit(null).cast(payloadType).as("__payload") +:
        carryCols.map(col): _*)

    val buildSide = buildDeduped.select(
      col("__entity") +:
        col("__ts") +:
        lit(0).as("__kind") +:
        col("__payload") +:
        carryCols.map(c => lit(null).cast(probe.schema(c).dataType).as(c)): _*)

    val unioned = probeSide.unionByName(buildSide)

    val w = Window
      .partitionBy(col("__entity"))
      .orderBy(col("__ts"), col("__kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = unioned
      .withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
      .where(col("__kind") === 1)

    val out = probeCols.map {
      case c if c == entityCol => col("__entity").as(entityCol)
      case c if c == probeTs   => col("__ts").as(probeTs)
      case c                   => col(c)
    } ++ payloadCols.map(c => col(s"__asof.$c").as(c))
    filled.select(out: _*)
  }

  /** The custom-exec formulation: a Catalyst sort-merge as-of join
    * (graft.plans.AsOfMergeJoinExec) planned through an injected Strategy.
    * Identical semantics to [[asOf]]; the physical shape is a single forward
    * merge over co-partitioned (entity, ts)-sorted children — no union
    * materialization, no window buffering, probe-side ordering preserved.
    *
    * Payload column names must not collide with probe column names. */
  def asOfSortMerge(
      probe: DataFrame,
      build: DataFrame,
      entityCol: String,
      probeTs: String,
      buildTs: String,
      payloadCols: Seq[String],
      dedupeLatest: Boolean = true): DataFrame = {
    val spark = probe.sparkSession
    graft.plans.AsOfStrategy.setup(spark)

    // entity AND ts cast to the probe's types: the merge exec's comparators
    // are bound to the probe types, so an uncast DATE build ts against a
    // TIMESTAMP probe would compare raw longs and silently mismatch. NULL
    // keys/ts never match (SQL ASOF semantics) — filtered here.
    val buildKeyed = build
      .where(col(entityCol).isNotNull && col(buildTs).isNotNull)
    // the struct wrap exists only to tunnel the payload through the
    // dedup groupBy's max; without dedup, stay a plain alias projection so
    // a pre-bucketed, pre-sorted build side keeps its reported partitioning
    // AND ordering (the zero-exchange, zero-sort bucketed-join path —
    // see TableSource.writeBucketed / BucketedJoinSpec)
    val buildFlat =
      if (dedupeLatest)
        buildKeyed
          .select(
            col(entityCol).cast(probe.schema(entityCol).dataType).as("__r_entity"),
            col(buildTs).cast(probe.schema(probeTs).dataType).as("__r_ts"),
            struct(payloadCols.map(col): _*).as("__payload"))
          .groupBy(col("__r_entity"), col("__r_ts"))
          .agg(max(col("__payload")).as("__payload"))
          .select(col("__r_entity") +: col("__r_ts") +:
            payloadCols.map(c => col(s"__payload.$c").as(c)): _*)
      else
        buildKeyed.select(
          col(entityCol).cast(probe.schema(entityCol).dataType).as("__r_entity") +:
            col(buildTs).cast(probe.schema(probeTs).dataType).as("__r_ts") +:
            payloadCols.map(col): _*)

    val bridge = org.apache.spark.sql.graftbridge.ColumnBridge
    val lp = bridge.analyzed(probe)
    val rp = bridge.analyzed(buildFlat)
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             name: String) =
      plan.output.find(_.name == name)
        .getOrElse(throw new IllegalArgumentException(s"missing column $name"))
        .asInstanceOf[org.apache.spark.sql.catalyst.expressions.Attribute]

    bridge.ofRows(spark, graft.plans.AsOfJoinNode(
      lp, rp,
      attr(lp, entityCol), attr(lp, probeTs),
      attr(rp, "__r_entity"), attr(rp, "__r_ts"),
      payloadCols.map(attr(rp, _))))
  }
}
