package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable

/** The continuous flagship pipeline — the composition the 100 TB
  * deployment runs end to end: a stream lands micro-batches as corpus
  * snapshot commits ([[graft.streaming.SnapshotIngest]]), and a periodic
  * maintenance job turns everything that arrived since its cursor into
  * flagship feature rows appended to a FEATURE SnapshotTable — windows
  * emitted exactly once across any number of kills and restarts.
  *
  * Window-closing contract: a tumbling window `[w, w+step)` is emitted
  * when the corpus watermark (max event time ingested so far) passes its
  * end — with time-ordered ingest no later row can land in it. Each cycle
  * emits exactly the windows in `[emitted, boundary(head))`, where
  * `boundary(s) = floor(maxTs(snapshot s) / step)` and `emitted` is the
  * feature table's own durable high-water mark (the newest `feat:b<bound>`
  * commit tag, backed by a `meta/feat-bound.txt` mark that survives
  * retention GC). Keying idempotency on BOUNDARY COVERAGE rather than the
  * processed snapshot window is what makes every crash seam safe: a cycle
  * that died between its feature commit and the cursor write, with MORE
  * corpus commits landing before the replay, re-derives `emitted` from the
  * committed state and emits only the genuinely new windows — a
  * window-pair tag would treat the wider replay window as never-committed
  * and duplicate everything below it. One maintenance job per feature
  * table (the single-consumer cursor convention). `maxTs(s)` comes from
  * the manifest's per-file stats when the ingest recorded them
  * (`statsCols = Seq(tsCol)`) — no data scan — and falls back to a scan.
  *
  * Exactness: the emitted rows equal the full-corpus batch run restricted
  * to the closed windows, because every order-dependent enrichment column
  * (lag delta, session cumsum) depends only on PRECEDING rows per entity
  * — rows at or above the closing boundary cannot change a closed
  * window's values. The cycle therefore computes over the pinned corpus
  * BELOW the new boundary and filters to the newly closed windows;
  * ContinuousPipelineSpec asserts bitwise equality with the one-shot run.
  *
  * Scale note: the enrichment read spans corpus history below the
  * boundary (lag/session state reaches back arbitrarily far for sparse
  * entities). That is the auditable-exactness default; the bounded-state
  * path is the streaming layer itself (flatMapGroupsWithState carries one
  * row of state per entity — see graft.streaming.StreamingFeatures) or
  * periodic per-entity state compaction. n_sessions is offset-invariant
  * (max−min+1 of the running session id), so a bounded-lookback variant
  * only needs each entity's last pre-boundary row, not its history.
  *
  * Late data: a row arriving with event time below an already-closed
  * boundary violates the time-ordered-ingest contract and will not be
  * re-windowed; route such rows to the corrupt-row channel
  * ([[graft.sources.ErrorChannel]]) at ingest, or widen the closing lag
  * by passing `lateness` > 0.
  */
object ContinuousFeatures {

  /** One maintenance cycle: process corpus commits since the cursor,
    * append the newly closed windows' feature rows to `featureDir`.
    * Returns the processed snapshot window, or None when nothing arrived.
    *
    * @param labels   the as-of label dimension (static or itself pinned)
    * @param stepSec  tumbling window width — must match the pipeline's
    *                 (FeaturePipeline.WindowDuration = 600s by default)
    * @param lateness extra seconds the watermark lags max event time */
  def cycle(spark: SparkSession, corpusDir: String, labels: DataFrame,
            featureDir: String, cursorPath: String, tsCol: String = "ts",
            stepSec: Long = 600L, lateness: Long = 0L): Option[(Long, Long)] =
    Incremental.processNewWithRange(spark, corpusDir, cursorPath) {
      (_, _, to) =>
        val bound = boundarySec(spark, corpusDir, to, tsCol, stepSec, lateness)
        val prev = emittedBound(featureDir).getOrElse(Long.MinValue)
        if (bound > prev) {
          val corpus = SnapshotTable.read(spark, corpusDir, Some(to))
            .where(unix_timestamp(col(tsCol)) < bound)
          val closed = FeaturePipeline.features(corpus, labels)
            .where(unix_timestamp(col("window_start")) >= prev &&
              unix_timestamp(col("window_start")) < bound)
          SnapshotTable.commit(spark, featureDir, closed, "append",
            Some(s"feat:b$bound"))
          writeBound(featureDir, bound)
        }
    }

  /** The COMPLETE maintenance pass — [[cycle]] plus automatic
    * [[repairClosedWindows]]: one scheduled call advances the feature
    * table's windows AND heals any takedown/upsert the corpus history
    * carried below the emitted boundary. Repair progress keeps its OWN
    * durable mark (`<featureDir>/meta/repair-upto.txt`) rather than
    * piggybacking on the cycle cursor: a crash between the cycle's cursor
    * write and the repair would otherwise put the mutation commits behind
    * the cursor forever, and the takedown would never be healed. The mark
    * advances only after the repair lands, so every seam replays into the
    * (idempotent) repair re-running. A fresh mark adopts the current head
    * without retroactive repair — the bootstrap cycle read the full
    * corpus, which already reflects every past mutation. A repair window
    * crossing an `overwrite`/`rollback` fails loudly each pass until the
    * operator re-derives the feature table and resets the mark (those
    * operations invalidate row-level history — same rule as [[SnapshotTable
    * .changelog]]). Returns the cycle's processed window. */
  def maintain(spark: SparkSession, corpusDir: String, labels: DataFrame,
               featureDir: String, cursorPath: String, tsCol: String = "ts",
               stepSec: Long = 600L, lateness: Long = 0L): Option[(Long, Long)] = {
    val res = cycle(spark, corpusDir, labels, featureDir, cursorPath,
      tsCol, stepSec, lateness)
    val markFile = java.nio.file.Paths.get(featureDir, "meta", "repair-upto.txt")
    // the repair HORIZON is the newest corpus snapshot the feature state
    // reflects — the cycle's processed `to`, or (idle cycle) the cursor.
    // Never a fresh head read: a takedown landing while a long cycle ran
    // is not in that cycle's pinned state, so marking it repaired would
    // skip its heal forever; it belongs to the next pass's horizon.
    val horizon = res.map(_._2)
      .orElse(Some(Incremental.readCursor(cursorPath)).filter(_ > 0L))
    horizon.foreach { upto =>
      def heal(fromMark: Long): Unit = {
        val mutated = (fromMark + 1 to upto).exists { id =>
          val op = SnapshotTable.snapshot(corpusDir, id).operation
          op == "delete" || op == "upsert"
        }
        if (mutated)
          repairClosedWindows(spark, corpusDir, labels, featureDir,
            fromMark, upto, tsCol)
        Incremental.writeLongFile(markFile, upto)
      }
      Incremental.readLongFile(markFile) match {
        case Some(mark) if mark < upto => heal(mark)
        case Some(_) => ()
        case None => res match {
          case Some((0L, to)) =>
            // fresh bootstrap: the full read at `to` reflected every
            // mutation at or below it — adopt without retroactive repair
            Incremental.writeLongFile(markFile, to)
          case Some((from, _)) =>
            // mark lost mid-stream (or migrating from cycle()-only use):
            // older windows were emitted from the state at `from`, so this
            // window's mutations still heal; anything before `from` is
            // adopted as-is (run repairClosedWindows manually if a
            // pre-migration takedown needs retroactive healing)
            heal(from)
          case None =>
            Incremental.writeLongFile(markFile, upto)
        }
      }
    }
    res
  }

  /** CLOSED-WINDOW REPAIR — the missing arrow between a corpus takedown
    * (or upsert) that rewrites HISTORY and a feature table whose closed
    * windows were computed from the old content. [[cycle]]'s contract
    * makes closed windows final under append-only time-ordered ingest; a
    * `deleteKeys`/`upsert` below the emitted boundary breaks that
    * finality, and this repairs it:
    *
    *  1. the corpus [[SnapshotTable.changelog]] over `(fromExclusive,
    *     toInclusive]` yields every row-level change WITH pre-images —
    *     so the affected ENTITIES are knowable even though the deleted
    *     rows are gone from the head;
    *  2. only changes below the emitted boundary matter (later rows
    *     belong to windows no cycle has emitted yet — the next cycle
    *     reads post-takedown state anyway);
    *  3. the affected entities' feature rows are recomputed from the
    *     post-change corpus and swapped in ATOMICALLY per entity:
    *     entities that still have rows go through one
    *     [[SnapshotTable.upsert]] (all their closed-window rows replaced
    *     in one commit — readers never see an entity half-repaired);
    *     entities with NO surviving rows are tombstoned
    *     ([[SnapshotTable.deleteKeys]] — an upsert can only replace keys
    *     present in its batch).
    *
    * Cost is O(affected entities' history), not O(corpus): the recompute
    * semi-joins the corpus on the affected entity set (broadcast for the
    * takedown-sized case). Re-running the same repair is safe — the
    * upsert replaces rows with identical recomputed values and the
    * tombstones are no-ops — so a crash between the two commits heals on
    * re-run. One repair per takedown commit window, invoked from the same
    * maintenance loop that owns the feature table (the single-consumer
    * convention). Returns the number of affected entities (0 = nothing
    * below the boundary changed). */
  def repairClosedWindows(spark: SparkSession, corpusDir: String,
                          labels: DataFrame, featureDir: String,
                          fromExclusive: Long, toInclusive: Long,
                          tsCol: String = "ts"): Long = {
    require(fromExclusive >= 1,
      "repair needs a concrete pre-change snapshot (fromExclusive >= 1); " +
        "a table whose whole history changed should be re-derived, not repaired")
    val bound = emittedBound(featureDir).getOrElse(return 0L)
    val cl = SnapshotTable.changelog(spark, corpusDir, fromExclusive, toInclusive)
    val affected = cl.where(unix_timestamp(col(tsCol)) < bound)
      .select(col("phash")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = affected.count()
      if (n == 0) return 0L
      // recompute from the CURRENT head, not the window's end: cycles may
      // have run since `toInclusive` and emitted the affected entities'
      // windows between the old and current bound — a recompute pinned at
      // `toInclusive` would lack those corpus rows, and the per-entity
      // upsert (which replaces ALL of an entity's feature rows) would
      // erase the legitimately-emitted newer windows. The head also
      // reflects any later changes to these entities, which a subsequent
      // repair for those windows then finds already applied.
      val corpus = SnapshotTable.read(spark, corpusDir, None)
        .where(unix_timestamp(col(tsCol)) < bound)
        .join(affected, Seq("phash"), "left_semi")
      val recomputed = FeaturePipeline.features(corpus, labels)
        .where(unix_timestamp(col("window_start")) < bound)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val vanished = affected.select(col("phash").as("entity"))
          .join(recomputed.select("entity"), Seq("entity"), "left_anti")
        if (!vanished.isEmpty)
          SnapshotTable.deleteKeys(spark, featureDir, "entity", vanished)
        if (!recomputed.isEmpty)
          SnapshotTable.upsert(spark, featureDir, "entity", recomputed)
      } finally recomputed.unpersist(blocking = false)
      n
    } finally affected.unpersist(blocking = false)
  }

  /** The upper boundary (exclusive) of everything this feature table has
    * already emitted: max of the newest `feat:b<bound>` commit tag (the
    * durable word — written atomically WITH the rows; newest-first
    * early-stop walk, [[SnapshotTable.findByTagPrefix]]) and the
    * `meta/feat-bound.txt` mark (survives manifest retention GC; written
    * after each commit). None on a fresh table. */
  private[graft] def emittedBound(featureDir: String): Option[Long] = {
    val fromTag = SnapshotTable.findByTagPrefix(featureDir, "feat:b")
      .flatMap(_.tag).map(_.stripPrefix("feat:b").toLong)
    (fromTag.toSeq ++ Incremental.readLongFile(boundFile(featureDir)).toSeq)
      .maxOption
  }

  private def boundFile(featureDir: String) =
    java.nio.file.Paths.get(featureDir, "meta", "feat-bound.txt")

  private def writeBound(featureDir: String, bound: Long): Unit =
    Incremental.writeLongFile(boundFile(featureDir), bound)

  /** The closing boundary for a corpus snapshot: the largest window start
    * NOT yet closed — `floor((maxTs − lateness) / step) * step`. Windows
    * strictly below it are complete. Manifest ts stats (epoch MICROS for
    * timestamp columns) decide without opening a file; absent stats fall
    * back to one max() over the pinned snapshot. An empty snapshot closes
    * nothing. */
  private[graft] def boundarySec(spark: SparkSession, corpusDir: String,
                                 snapshotId: Long, tsCol: String,
                                 stepSec: Long, lateness: Long): Long = {
    val snap = SnapshotTable.snapshot(corpusDir, snapshotId)
    // the boundary arithmetic below divides manifest stats by 1e6 (epoch
    // MICROS, TimestampType's physical encoding) and the corpus filter
    // uses unix_timestamp — both silently produce garbage (boundary ~0,
    // no window ever emitted) on a numeric epoch column, so refuse loudly
    snap.schemaJson.foreach { js =>
      org.apache.spark.sql.types.DataType.fromJson(js)
        .asInstanceOf[org.apache.spark.sql.types.StructType]
        .find(_.name == tsCol).foreach { f =>
          require(f.dataType == org.apache.spark.sql.types.TimestampType,
            s"ContinuousFeatures needs a TimestampType event-time column; " +
              s"'$tsCol' is ${f.dataType.simpleString} in $corpusDir — " +
              "ingest the stream with a timestamp ts (epoch numbers have " +
              "no declared unit to derive window boundaries from)")
        }
    }
    if (snap.files.isEmpty) return Long.MinValue
    val statMaxes = snap.files.map(_.stats.collectFirst {
      case (c, _, mx) if c == tsCol => mx
    })
    val maxSec: Long =
      if (statMaxes.forall(_.isDefined)) statMaxes.flatten.max / 1000000L
      else {
        val r = SnapshotTable.read(spark, corpusDir, Some(snapshotId))
          .agg(max(unix_timestamp(col(tsCol)))).collect()(0)
        if (r.isNullAt(0)) return Long.MinValue else r.getLong(0)
      }
    Math.floorDiv(maxSec - lateness, stepSec) * stepSec
  }
}
