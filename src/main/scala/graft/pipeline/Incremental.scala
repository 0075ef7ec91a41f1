package graft.pipeline

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.SnapshotTable

/** Cursor-based incremental consumption of a [[SnapshotTable]] — the
  * periodic-batch pattern at 100 TB: a job that runs every N minutes must
  * process the rows that ARRIVED since its last run, not re-scan the
  * corpus. The cursor is a durable snapshot id; each call processes
  * exactly the commits in `(cursor, head]` via the manifest file-set diff
  * ([[SnapshotTable.changes]] — no data-column watermark needed, no
  * late-arrival edge cases, because membership is decided by COMMIT, not
  * by row timestamps) and then advances the cursor.
  *
  * Delivery is at-least-once: the cursor advances only after `job`
  * returns, so a crash between the two replays the window. Pair the job
  * with an idempotent sink — [[Lineage.runResumable]]'s dynamic partition
  * overwrite, or a [[SnapshotTable]] commit tagged with the window (the
  * [[graft.streaming.SnapshotIngest]] dedup) — for exactly-once effect.
  *
  * One consumer per cursor file. Independent consumers (different jobs
  * over the same table) each keep their own cursor and never coordinate.
  *
  * Reference semantics: musif re-runs extract over a corpus and skips
  * already-extracted files (`/root/reference/musif/extract/extract.py:559-575`)
  * — that is membership-by-presence over a mutable directory; here
  * membership is by COMMIT over an immutable snapshot log, which stays
  * exact when files arrive concurrently with the job.
  */
object Incremental {

  /** Process everything committed since the cursor. Returns the processed
    * snapshot range `(fromExclusive, toInclusive)`, or None when the table
    * has no new commits (the job is not invoked). A cursor of 0 (first
    * run) processes the full current snapshot — bootstrap and steady state
    * are the same call. `delete` commits in the window are fine (inherited
    * from [[SnapshotTable.changes]]): a takedown adds no files, the job
    * sees the window's appends with the window's tombstones applied, and
    * already-delivered rows are never re-reported — derived state composes
    * the takedown in explicitly ([[IncrementalDedup.retract]]). Crossing
    * an `overwrite` commit still fails: an overwrite invalidates
    * incremental history, so the consumer must restart from a full read
    * (reset the cursor) rather than silently miss replaced rows. */
  def processNew(spark: SparkSession, tableDir: String, cursorPath: String)
                (job: DataFrame => Unit): Option[(Long, Long)] =
    processNewWithRange(spark, tableDir, cursorPath)((df, _, _) => job(df))

  /** [[processNew]] that also hands the job its snapshot window
    * `(fromExclusive, toInclusive)` — consumers that make their side
    * effects idempotent (e.g. [[IncrementalDedup]]'s tagged state commits)
    * key the idempotency on exactly this range, so a crash between `job`
    * and the cursor write replays into a detectable no-op. */
  def processNewWithRange(spark: SparkSession, tableDir: String, cursorPath: String)
                         (job: (DataFrame, Long, Long) => Unit): Option[(Long, Long)] = {
    val last = readCursor(cursorPath)
    val head = SnapshotTable.currentSnapshotId(tableDir).getOrElse(return None)
    if (head <= last) return None
    val fresh =
      if (last == 0L) SnapshotTable.read(spark, tableDir, Some(head))
      else SnapshotTable.changes(spark, tableDir, last, head)
    job(fresh, last, head)
    writeCursor(cursorPath, head)
    Some((last, head))
  }

  private[graft] def readCursor(path: String): Long =
    readLongFile(Paths.get(path)).getOrElse(0L)

  private[graft] def writeCursor(path: String, id: Long): Unit =
    writeLongFile(Paths.get(path), id)

  /** The single-writer marker-file convention shared by the cursor, the
    * dedup `processed-upto` mark and the feature `feat-bound` mark: an
    * atomic REPLACE (unlike the first-writer-wins pin/manifest publishes)
    * — the newest position wins. */
  private[graft] def readLongFile(p: java.nio.file.Path): Option[Long] =
    if (!Files.exists(p)) None
    else Some(new String(Files.readAllBytes(p), "UTF-8").trim.toLong)

  private[graft] def writeLongFile(p: java.nio.file.Path, v: Long): Unit = {
    Option(p.getParent).foreach(Files.createDirectories(_))
    val tmp = Files.createTempFile(
      Option(p.getParent).getOrElse(Paths.get(".")), ".cursor-staging", ".txt")
    Files.write(tmp, v.toString.getBytes("UTF-8"))
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
