package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import graft.sources.SnapshotTable

/** Streaming ingest that lands every micro-batch as one
  * [[SnapshotTable]] append commit — the glue between the streaming and
  * table layers: a continuous source feeds the versioned corpus, and every
  * downstream batch job reads a CONSISTENT snapshot of it (pinned resume,
  * time travel, [[SnapshotTable.changes]] incremental scans), never a
  * half-written directory.
  *
  * Exactly-once per micro-batch: `foreachBatch` replays the in-flight batch
  * after a restart, so each commit is stamped with an idempotency tag
  * (`<source>:batch-<epochId>`, the Iceberg snapshot-summary approach) and
  * a replayed batch that already committed is skipped instead of appended
  * twice. The dedup check scans the retained manifests — O(#snapshots) of
  * small JSON, and replays only ever target the most recent batch, far
  * inside any sane [[SnapshotTable.expireSnapshots]] retention.
  *
  * This is the streaming face of the corpus-ingest story (musif corpora
  * arrive as files dropped in a directory,
  * `/root/reference/musif/extract/extract.py:170-189`; at 10^12-image scale
  * arrival is a stream and the "directory" must version atomically).
  */
object SnapshotIngest {

  /** Start ingesting `df` (a streaming DataFrame) into the snapshot table
    * at `tableDir`. `source` namespaces the idempotency tags — give each
    * concurrently ingesting query its own name (identifier characters
    * only: the name is also a filename in `meta/`).
    *
    * With `bucketSpec`, every micro-batch commits BUCKET-TRANSFORMED
    * ([[SnapshotTable.commitBucketed]]) so the continuously-ingesting
    * corpus keeps the zero-exchange layout entity-keyed readers plan
    * against — without this a bucketed table would refuse the stream's
    * plain appends and the ingest would wedge against the layout. Each
    * micro-batch writes `spec.buckets` files; run
    * [[SnapshotTable.compact]] on the usual maintenance schedule to
    * collapse them back to one file per bucket (the layout is preserved
    * through the rewrite) — the Iceberg streaming-write + periodic
    * rewrite_data_files pattern. */
  def start(df: DataFrame, tableDir: String, checkpointDir: String,
            source: String = "ingest",
            statsCols: Seq[String] = Nil,
            bucketSpec: Option[SnapshotTable.BucketSpec] = None): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        commitOnce(batch, tableDir, source, epochId, statsCols, bucketSpec); ()
      }
      .start()

  /** Commit one micro-batch unless a commit with its tag already exists.
    * Returns true when a new snapshot was committed, false on a detected
    * replay. Package-visible so the replay branch is directly testable.
    * `statsCols` (typically the event-time column of a time-ordered
    * stream, plus any clustering key) records per-file min/max in the
    * manifest: each commit's files then span only that batch's time
    * window, and [[SnapshotTable.readRange]] over "the last hour" skips
    * every older file without opening it. */
  private[graft] def commitOnce(batch: DataFrame, tableDir: String,
                                source: String, epochId: Long,
                                statsCols: Seq[String] = Nil,
                                bucketSpec: Option[SnapshotTable.BucketSpec] = None): Boolean = {
    require(source.matches("[A-Za-z0-9._-]+"),
      s"source name must be filename-safe (it keys meta/source-<name>.txt): $source")
    val tag = s"$source:batch-$epochId"
    if (alreadyCommitted(tableDir, source, epochId, tag)) false
    else {
      bucketSpec match {
        case Some(spec) => SnapshotTable.commitBucketed(batch.sparkSession,
          tableDir, batch, spec, "append", Some(tag), statsCols)
        case None => SnapshotTable.commit(batch.sparkSession, tableDir,
          batch, "append", Some(tag), statsCols)
      }
      // durable high-water mark OUTSIDE the expirable manifest log: if
      // retention GC later expires every tagged manifest from this source
      // (a long stream downtime), the replay check below still has a
      // cursor to decide against — without this, a replayed epoch whose
      // manifests were all GC'd would be silently double-appended.
      // Written AFTER the commit: a crash between the two leaves the
      // manifest (the newest, never GC'd within a replay window) to decide.
      writeEpoch(tableDir, source, epochId)
      true
    }
  }

  /** Replay check that stays cheap over a long-running stream: walk the
    * manifests NEWEST-first and stop at the first commit from this source
    * — epochs are monotonic per source, so if that newest commit carries
    * an older epoch than ours, ours was never committed (no need to parse
    * the rest of the log; a naive full scan re-parses every manifest's
    * whole file list on every micro-batch, quadratic over the stream's
    * lifetime). Other sources' interleaved commits are skipped over.
    * When NO manifest from this source survives (all expired by
    * [[SnapshotTable.expireSnapshots]] during the stream's downtime), the
    * durable `meta/source-<name>.txt` high-water mark decides instead of
    * failing open. */
  private def alreadyCommitted(tableDir: String, source: String,
                               epochId: Long, tag: String): Boolean = {
    val prefix = s"$source:batch-"
    SnapshotTable.snapshotIds(tableDir).reverseIterator.map { id =>
      SnapshotTable.snapshot(tableDir, id).tag match {
        case Some(t) if t == tag => Some(true)
        case Some(t) if t.startsWith(prefix) =>
          // this source's newest other epoch: decides either way
          Some(t.stripPrefix(prefix).toLong > epochId)
        case _ => None // another source / untagged: keep walking
      }
    }.collectFirst { case Some(d) => d }
      .getOrElse(readEpoch(tableDir, source).exists(_ >= epochId))
  }

  private def epochFile(tableDir: String, source: String) =
    java.nio.file.Paths.get(tableDir, "meta", s"source-$source.txt")

  // single writer per source (foreachBatch serializes epochs): the shared
  // marker-file convention — atomic REPLACE, newest position wins
  private[streaming] def readEpoch(tableDir: String, source: String): Option[Long] =
    graft.pipeline.Incremental.readLongFile(epochFile(tableDir, source))

  private def writeEpoch(tableDir: String, source: String, epochId: Long): Unit =
    graft.pipeline.Incremental.writeLongFile(epochFile(tableDir, source), epochId)
}
