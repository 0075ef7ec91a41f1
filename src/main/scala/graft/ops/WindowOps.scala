package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered per-entity analytics: backfill, sessionization, run-length
  * segmentation, sliding window ids, rolling means, diff chains.
  *
  * All operators are pure `DataFrame => DataFrame` built from window
  * functions over `Window.partitionBy(entity).orderBy(ts)` — one shuffle by
  * entity, reused across chained operators when the partitioning is already
  * in place (Catalyst elides redundant exchanges for compatible windows).
  */
object WindowOps {

  /** Forward-fill nulls with the most recent non-null value at-or-before the
    * current row (bounded-preceding backfill). Reference: time-signature
    * inheritance `/root/reference/musif/extract/features/tempo/handler.py:118-136`
    * and tonality-map gap fill `scale_relative/utils.py:61-72`.
    */
  def backfill(df: DataFrame, entity: Seq[String], order: Seq[String],
               fillCols: Seq[String], outSuffix: String = "_filled"): DataFrame = {
    val w = Window
      .partitionBy(entity.map(col): _*)
      .orderBy(order.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fillCols.foldLeft(df) { (d, c) =>
      d.withColumn(c + outSuffix, last(col(c), ignoreNulls = true).over(w))
    }
  }

  /** Shared chunk-id pattern: a 0-based id per entity that increments where
    * `headFlag` (evaluated against the lag-accessible frame) is 1. All three
    * chunking operators (sessions, runs, tie chains) are this one idiom. */
  private def runningId(df: DataFrame, entity: Seq[String], order: Seq[String],
                        headFlag: Column, outCol: String): DataFrame = {
    val wOrd = Window.partitionBy(entity.map(col): _*).orderBy(order.map(col): _*)
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__head", headFlag)
      .withColumn(outCol, sum(col("__head")).over(wRun) - 1)
  }

  /** Gap-based sessionization: a new session starts when the time delta from
    * the previous event exceeds `gapSeconds` (or at the entity head). Emits
    * `session_id` (0-based per entity). Reference pattern: run detection via
    * `groupby(diff(...))` `/root/reference/musif/extract/features/melody/handler.py:675-689`.
    */
  def sessionize(df: DataFrame, entity: Seq[String], tsCol: String,
                 gapSeconds: Long, sessionCol: String = "session_id",
                 tieBreak: Seq[String] = Nil): DataFrame = {
    // tieBreak doesn't change session assignment (equal ts -> delta 0 <= gap)
    // but aligning the sort order with sibling windows lets Catalyst run all
    // of them off ONE sort within the entity partitions
    val wOrd = Window.partitionBy(entity.map(col): _*)
      .orderBy((col(tsCol) +: tieBreak.map(col)): _*)
    val prev = lag(col(tsCol), 1).over(wOrd)
    val isNew = when(prev.isNull, 1)
      .when(unix_timestamp(col(tsCol)) - unix_timestamp(prev) > gapSeconds, 1)
      .otherwise(0)
    runningId(df, entity, tsCol +: tieBreak, isNew, sessionCol).drop("__head")
  }

  /** Run-length segmentation: consecutive rows with the same `valueCol` get
    * the same `segment_id` (0-based per entity); a change starts a new
    * segment. Reference: key-area runs `/root/reference/musif/extract/features/harmony/utils.py:207-218`,
    * ascent/descent chunks `melody/handler.py:675-689`.
    */
  def runLength(df: DataFrame, entity: Seq[String], order: Seq[String],
                valueCol: String, segmentCol: String = "segment_id"): DataFrame = {
    val wOrd = Window.partitionBy(entity.map(col): _*).orderBy(order.map(col): _*)
    val changed = when(
      lag(col(valueCol), 1).over(wOrd).isNull ||
        lag(col(valueCol), 1).over(wOrd) =!= col(valueCol), 1).otherwise(0)
    runningId(df, entity, order, changed, segmentCol).drop("__head")
  }

  /** Sliding windows over a discrete sequence axis (musif's measure windows):
    * window w covers positions [w*hop, w*hop + size), hop = size - overlap;
    * each row is exploded into every window containing it. Reference:
    * `/root/reference/musif/extract/extract.py:416-464` (`number_windows =
    * (n - overlap) // hop`).
    *
    * Generator-shaped (1 row -> ceil(size/hop) rows max) — no shuffle here;
    * downstream groupBy(entity, window_id) is where the exchange happens.
    */
  def slidingWindowIds(df: DataFrame, seqCol: String, size: Int, overlap: Int,
                       windowCol: String = "window_id"): DataFrame = {
    require(size > overlap && overlap >= 0, s"need size > overlap >= 0, got $size/$overlap")
    val hop = size - overlap
    // windows containing seq: ceil((seq - size + 1)/hop) .. floor(seq/hop)
    val lo = greatest(lit(0),
      ceil((col(seqCol) - size + 1).cast("double") / hop).cast("long"))
    val hi = floor(col(seqCol).cast("double") / hop).cast("long")
    df.withColumn(windowCol, explode(sequence(lo, hi)))
  }

  /** Centered rolling mean over +-win rows (reference: midi smoothing before
    * run detection, `melody/handler.py:667-670`). */
  def rollingMean(df: DataFrame, entity: Seq[String], order: Seq[String],
                  valueCol: String, win: Int, outCol: String): DataFrame = {
    val w = Window.partitionBy(entity.map(col): _*)
      .orderBy(order.map(col): _*)
      .rowsBetween(-win, win)
    df.withColumn(outCol, avg(col(valueCol)).over(w))
  }

  /** First/second discrete derivative over an ordered series (reference:
    * speed/acceleration chains `melody/handler.py:652-662`). */
  def diffChain(df: DataFrame, entity: Seq[String], order: Seq[String],
                valueCol: String, step: Double = 1.0): DataFrame = {
    val w = Window.partitionBy(entity.map(col): _*).orderBy(order.map(col): _*)
    val speed = (col(valueCol) - lag(col(valueCol), 1).over(w)) / step
    df.withColumn("speed", speed)
      .withColumn("accel", (col("speed") - lag(col("speed"), 1).over(w)) / step)
  }

  /** Tie-merge (P3): collapse chains of tied events into one event summing
    * durations and keeping the chain head's attributes. Reference rule
    * (`set_ties`, `/root/reference/musif/extract/features/density/handler.py:175-197`):
    * a row HEADS a chain unless its tie marker is "continue" or "stop" —
    * null, "start", the "-" untied sentinel of the tie export
    * (`cache/utils.py:164-168`) and any other marker all start fresh.
    * Defensively, the first row of an entity always heads (input sliced
    * mid-chain must not produce a headless, null-attributed chain).
    *
    * Sessionize-shaped: 0-based chain id per entity = running count of
    * heads, then one hash aggregate per chain. */
  def tieMerge(df: DataFrame, entity: Seq[String], order: Seq[String],
               tieCol: String, durationCol: String,
               keepCols: Seq[String]): DataFrame = {
    val wOrd = Window.partitionBy(entity.map(col): _*).orderBy(order.map(col): _*)
    val isHead = when(
      col(tieCol).isNull || !col(tieCol).isin("continue", "stop") ||
        row_number().over(wOrd) === 1, 1).otherwise(0)
    val chained = runningId(df, entity, order, isHead, "__chain")
    // head attributes via the chain's unique head row (exactly one __head=1
    // per chain by construction) — deterministic, unlike first() in an
    // unordered aggregate
    val agged = chained
      .groupBy((entity.map(col) :+ col("__chain").as("chain_id")): _*)
      .agg(
        max(when(col("__head") === 1, struct(keepCols.map(col): _*))).as("__h"),
        sum(col(durationCol)).as(durationCol),
        count(lit(1)).as("chain_len"))
    agged.select(
      entity.map(col) ++ Seq(col("chain_id")) ++
        keepCols.map(c => col(s"__h.$c").as(c)) ++
        Seq(col(durationCol), col("chain_len")): _*)
  }

  /** Compress consecutive duplicates: keep rows whose value differs from the
    * previous row's (reference: `harmony/utils.py:23`). */
  def compressRuns(df: DataFrame, entity: Seq[String], order: Seq[String],
                   valueCol: String): DataFrame = {
    val w = Window.partitionBy(entity.map(col): _*).orderBy(order.map(col): _*)
    // null-safe comparison + explicit head: `prev =!= value` is NULL when
    // either side is null, which would silently DROP null-valued rows —
    // null is a legitimate run value and heads must always survive
    df.withColumn("__prev", lag(col(valueCol), 1).over(w))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 || !(col("__prev") <=> col(valueCol)))
      .drop("__prev", "__rn")
  }
}
