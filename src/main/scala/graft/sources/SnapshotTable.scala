package graft.sources

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-versioned parquet table — the sandbox stand-in for an Iceberg
  * table's snapshot log (no Iceberg jars ship in this zero-egress sandbox;
  * `TableSource.scala:9` documents the production `table:` path). What it
  * reproduces is the SEMANTICS the north rule needs from "resumable from
  * Iceberg snapshot checkpoints", as actual tested behavior rather than an
  * abstraction boundary:
  *
  *  - every commit (append / overwrite) publishes an immutable SNAPSHOT: a
  *    manifest JSON under `meta/` listing exactly the data files live at
  *    that version, with per-file row counts and bytes taken from parquet
  *    footers at write time (no data re-scan, the `total-records` analog
  *    that already sizes ANN buckets via [[TableSource.parquetRowCount]]);
  *  - readers resolve a snapshot ONCE (latest, or a pinned id) and plan
  *    over exactly that file list — a concurrent append can never leak
  *    rows into a running or resumed job. This is the table-level twin of
  *    the as-of join's zero-temporal-leakage rule: pinning bounds WHICH
  *    rows exist, the as-of join bounds which rows are VISIBLE at each ts;
  *  - commits are atomic and optimistic: the manifest is staged to a temp
  *    file and published with an atomic CREATE_NEW move keyed by the
  *    snapshot id; losing a publish race re-reads the winner's file list
  *    and retries on top of it (Iceberg's optimistic-concurrency commit
  *    loop). Data files are immutable and uniquely named, so a lost race
  *    never rewrites data — only the cheap manifest step repeats;
  *  - incremental reads: the file-set difference between two snapshots is
  *    an append-only changelog ([[changes]], Iceberg's incremental append
  *    scan) — the batch analog of a streaming source, letting periodic
  *    jobs process only what arrived since their last pinned snapshot;
  *  - a table can carry a BUCKET LAYOUT ([[commitBucketed]] /
  *    [[readBucketed]]): every commit's data files are hash-bucketed and
  *    per-bucket sorted, the manifest records the spec, and a (pinned)
  *    read re-attaches the bucketing metadata — snapshot isolation AND
  *    the zero-exchange plan at once, Iceberg's bucket partition
  *    transform + snapshot isolation operating together;
  *  - row-level DELETES ([[deleteKeys]]): an equality-delete tombstone
  *    commit is O(|keys|) no matter the table size — data files are never
  *    rewritten; readers anti-join the tombstones with sequence semantics
  *    (a delete applies only to files older than it, so later re-inserts
  *    survive). [[compact]] is the rewrite_data_files analog: one
  *    overwrite that consumes tombstones, collapses small ingest files,
  *    preserves the bucket layout, and refuses to clobber a concurrent
  *    commit (rewrite validation via an expected-head check);
  *  - [[expireSnapshots]] garbage-collects manifests outside the retention
  *    window and data/tombstone files unreachable from any retained
  *    snapshot. At 100 TB the data files are the cost: time travel must be
  *    bounded by explicit retention, not "keep every version forever".
  *
  * Layout (all paths inside the manifest are RELATIVE to the table root,
  * so a table directory is relocatable as a unit):
  * {{{
  *   <tableDir>/data/c-<uuid>/part-*.parquet   immutable data files
  *   <tableDir>/meta/snap-<id>.json            one manifest per snapshot
  *   <tableDir>/views/snap-<id>/               hard-link farms for bucketed
  *                                             snapshot reads (derived,
  *                                             GC'd with their snapshot)
  * }}}
  * The current snapshot is the max id present in `meta/` — there is no
  * mutable HEAD pointer to corrupt; publishing the manifest IS the commit
  * point (crash before it = clean rollback, the new data files are
  * unreferenced and a later [[expireSnapshots]] sweeps them).
  *
  * Scale note: resolving a snapshot lists one directory of small JSON
  * files and reads one of them — O(#snapshots), independent of data size.
  * The Spark read plans over the explicit file list, so partition pruning,
  * predicate pushdown and column pruning all apply per normal parquet
  * scans (the manifests carry no schema — parquet footers stay the source
  * of truth, which also makes mid-table schema widening read correctly
  * via `mergeSchema` if a caller needs it).
  *
  * Reference semantics: musif has no table versioning (a corpus is a
  * directory of files read at whatever state it's in,
  * `/root/reference/musif/extract/extract.py:170-189`); this layer is part
  * of the north rule's scale-up of that corpus model.
  */
object SnapshotTable {

  /** One immutable data file of a snapshot. `path` is relative to the
    * table root; `rows`/`bytes` come from the parquet footer at commit
    * time so later sizing decisions (e.g. ANN cell counts over a pinned
    * snapshot) never need a data scan. `stats` carries zero or more
    * columns' (name, min, max) — also footer-derived — enabling
    * [[SnapshotTable.readRange]] / [[SnapshotTable.readRangeMulti]] to
    * skip whole files without opening them (Iceberg's manifest min/max
    * file skipping; names are stored per file so commits with different
    * stats columns co-exist and pruning never consults the wrong
    * column's bounds). Multi-column stats let independent pruning
    * dimensions COMPOSE — e.g. entity-range AND time-range over an
    * ingest clustered on both. `addedAt` is the snapshot id whose commit
    * added the file (the Iceberg data-sequence-number analog): equality
    * deletes apply only to files STRICTLY OLDER than the delete, so a row
    * re-inserted after a delete survives it. Legacy manifests default to
    * 0 — every delete applies, which is vacuously correct because such
    * tables predate the delete operation entirely. */
  final case class DataFile(path: String, rows: Long, bytes: Long,
                            stats: Seq[(String, Long, Long)] = Nil,
                            addedAt: Long = 0L)

  /** One immutable equality-delete tombstone file (the Iceberg
    * equality-delete-file analog): a parquet file of key values under
    * `data/d-<uuid>/` whose single column `keyCol` names the rows to
    * remove. `addedAt` is the delete snapshot's id; the file applies to
    * exactly the data files with `DataFile.addedAt < addedAt`. Duplicate
    * keys across delete files are harmless (anti-join semantics), and
    * deleting an absent key is a no-op — a takedown list can be applied
    * verbatim without first probing the corpus. */
  final case class DeleteFile(path: String, keyCol: String, rows: Long,
                              bytes: Long, addedAt: Long)

  /** A table-level bucket layout: every data file of every commit is
    * hash-bucketed on `bucketCol` into `buckets` buckets (Spark's
    * murmur3-pmod bucketing, one file per bucket per commit) and sorted
    * within each bucket by `sortCols`. Recorded in the manifest so a
    * snapshot read can re-attach the metadata ([[readBucketed]]) and plan
    * entity-keyed work exchange-free — the Iceberg bucket partition
    * transform analog. */
  final case class BucketSpec(buckets: Int, bucketCol: String,
                              sortCols: Seq[String])

  /** An immutable table version. `files` is the COMPLETE live set at this
    * snapshot (not a delta) — reads never chase parent chains, and
    * expiring a parent never breaks a retained child. `tag` is an optional
    * committer-supplied idempotency token (the Iceberg snapshot-summary
    * analog): a streaming sink stamps `<source>:batch-<id>` so a replayed
    * micro-batch is detected instead of double-appended. */
  final case class Snapshot(
      id: Long,
      parentId: Option[Long],
      operation: String, // append | overwrite | delete | replace | upsert | rollback
      committedAtMs: Long,
      files: Seq[DataFile],
      tag: Option[String] = None,
      schemaJson: Option[String] = None,
      bucketSpec: Option[BucketSpec] = None,
      deletes: Seq[DeleteFile] = Nil) {
    def totalRows: Long = files.map(_.rows).sum
    def totalBytes: Long = files.map(_.bytes).sum
  }

  private def metaDir(tableDir: String): Path = Paths.get(tableDir, "meta")
  private def manifestPath(tableDir: String, id: Long): Path =
    metaDir(tableDir).resolve(f"snap-$id%08d.json")
  private def viewDir(tableDir: String, id: Long): Path =
    Paths.get(tableDir, "views", f"snap-$id%08d")

  /** Latest snapshot id, or None for an empty/uninitialized table. The max
    * over the manifest listing is the source of truth (no mutable pointer). */
  def currentSnapshotId(tableDir: String): Option[Long] = {
    val md = metaDir(tableDir)
    if (!Files.isDirectory(md)) None
    else {
      val listing = Files.list(md)
      try {
        import scala.jdk.CollectionConverters._
        val ids = listing.iterator().asScala.flatMap { p =>
          val n = p.getFileName.toString
          if (n.startsWith("snap-") && n.endsWith(".json"))
            Some(n.stripPrefix("snap-").stripSuffix(".json").toLong)
          else None
        }.toSeq
        if (ids.isEmpty) None else Some(ids.max)
      } finally listing.close()
    }
  }

  /** Newest-first idempotency-tag lookup: the snapshot whose `tag` equals
    * `tag`, or None. Tags mark at-most-once work (a streaming epoch, an
    * incremental-dedup batch window), and replays only ever target recent
    * commits, so the newest-first walk usually stops after a handful of
    * small manifest reads. A tagged commit that was already expired by
    * [[expireSnapshots]] is invisible here — callers that survive long
    * downtimes must keep a durable high-water mark outside the manifest
    * log (the [[graft.streaming.SnapshotIngest]] `meta/source-*.txt`
    * pattern). */
  def findByTag(tableDir: String, tag: String): Option[Snapshot] =
    snapshotIds(tableDir).reverseIterator
      .map(id => snapshot(tableDir, id))
      .find(_.tag.contains(tag))

  /** The NEWEST snapshot whose tag starts with `prefix`, walking newest-
    * first and stopping at the first match — the bounded-cost lookup for
    * single-consumer monotone tag families (`dedup-sig:<from>-<to>`,
    * `feat:b<bound>`): a consumer that processes windows in order can
    * decide "was window W committed?" from the newest same-prefix tag
    * alone, without the full-log walk a [[findByTag]] miss costs (that
    * miss parses EVERY manifest — quadratic over a long-running stream's
    * lifetime when a fresh window is checked each cycle). */
  def findByTagPrefix(tableDir: String, prefix: String): Option[Snapshot] =
    snapshotIds(tableDir).reverseIterator
      .map(id => snapshot(tableDir, id))
      .find(_.tag.exists(_.startsWith(prefix)))

  /** Load one snapshot's manifest. */
  def snapshot(tableDir: String, id: Long): Snapshot = {
    val p = manifestPath(tableDir, id)
    require(Files.exists(p), s"no snapshot $id in $tableDir (expired or never committed)")
    parseManifest(new String(Files.readAllBytes(p), "UTF-8"))
  }

  /** Retained snapshot ids, oldest first — a directory listing, no
    * manifest parsing (for callers that walk manifests selectively, e.g.
    * the streaming sink's replay check). */
  def snapshotIds(tableDir: String): Seq[Long] = {
    val md = metaDir(tableDir)
    if (!Files.isDirectory(md)) Nil
    else {
      val listing = Files.list(md)
      try {
        import scala.jdk.CollectionConverters._
        listing.iterator().asScala
          .map(_.getFileName.toString)
          .filter(n => n.startsWith("snap-") && n.endsWith(".json"))
          .map(n => n.stripPrefix("snap-").stripSuffix(".json").toLong)
          .toSeq.sorted
      } finally listing.close()
    }
  }

  /** All retained snapshots, oldest first. */
  def snapshots(tableDir: String): Seq[Snapshot] =
    snapshotIds(tableDir).map(snapshot(tableDir, _))

  /** Commit `df` as a new snapshot. Data files are written first (to a
    * unique `data/c-<uuid>` directory — immutable once written), then the
    * manifest is published atomically; the publish is the commit point.
    * Appending to a table whose head carries a [[BucketSpec]] is refused —
    * a plain unbucketed commit would silently break the layout every
    * downstream job plans against; use [[commitBucketed]] (an `overwrite`
    * resets the layout and is allowed). Returns the committed snapshot. */
  def commit(spark: SparkSession, tableDir: String, df: DataFrame,
             operation: String = "append", tag: Option[String] = None,
             statsCols: Seq[String] = Nil): Snapshot = {
    require(operation == "append" || operation == "overwrite",
      s"unsupported operation: $operation")
    val newFiles = writeCommitDir(spark, tableDir, df, statsCols)
    publishLoop(tableDir, operation, newFiles, tag, Some(df.schema.json), None)
  }

  /** Write `df` as-is into a fresh commit directory and return its
    * [[DataFile]]s (shared by [[commit]] and the unbucketed
    * [[compactFrom]] path). */
  private def writeCommitDir(spark: SparkSession, tableDir: String,
                             df: DataFrame, statsCols: Seq[String]): Seq[DataFile] = {
    Files.createDirectories(metaDir(tableDir))
    val commitId = java.util.UUID.randomUUID().toString.take(12)
    val rel = s"data/c-$commitId"
    val dataPath = Paths.get(tableDir, rel)
    df.write.parquet(dataPath.toString)
    listParquet(spark, dataPath, statsCols).map {
      case (name, rows, bytes, st) => DataFile(s"$rel/$name", rows, bytes, st)
    }
  }

  def append(spark: SparkSession, tableDir: String, df: DataFrame): Snapshot =
    commit(spark, tableDir, df, "append")

  def overwrite(spark: SparkSession, tableDir: String, df: DataFrame): Snapshot =
    commit(spark, tableDir, df, "overwrite")

  /** Commit `df` BUCKETED: hash-bucketed on `spec.bucketCol` into
    * `spec.buckets` files (one per bucket — the repartition's murmur3-pmod
    * HashPartitioning is the same function bucketing uses, so each output
    * task holds exactly one bucket), each sorted by `spec.sortCols`, with
    * the spec recorded in the manifest. Appends onto an existing bucketed
    * head must carry the IDENTICAL spec (appending a different layout —
    * or onto an unbucketed head — is refused: reads would silently plan
    * wrong bucket placement). [[readBucketed]] re-attaches the layout at
    * any retained snapshot.
    *
    * This is the composition the 100 TB deployment wants: the corpus is
    * written bucket-transformed INSIDE snapshot commits, so a pinned read
    * is simultaneously isolated from concurrent appends AND exchange-free
    * for entity-keyed work (Iceberg's bucket partition transform +
    * snapshot isolation operating together). */
  def commitBucketed(spark: SparkSession, tableDir: String, df: DataFrame,
                     spec: BucketSpec, operation: String = "append",
                     tag: Option[String] = None,
                     statsCols: Seq[String] = Nil): Snapshot = {
    require(operation == "append" || operation == "overwrite",
      s"unsupported operation: $operation")
    val newFiles = writeBucketedCommitDir(spark, tableDir, df, spec, statsCols)
    publishLoop(tableDir, operation, newFiles, tag, Some(df.schema.json), Some(spec))
  }

  /** Write `df` bucket-transformed into a fresh commit directory and
    * return its [[DataFile]]s (shared by [[commitBucketed]] and the
    * bucketed [[compactFrom]] path). bucketBy is only reachable through
    * saveAsTable — register a throwaway EXTERNAL table at the commit
    * directory, then drop the catalog entry (external drop leaves the
    * files). The files carry the bucket id in their names
    * (part-...-_00003.c000...), which is what readBucketed's re-attached
    * DDL keys on. */
  private def writeBucketedCommitDir(spark: SparkSession, tableDir: String,
                                     df: DataFrame, spec: BucketSpec,
                                     statsCols: Seq[String]): Seq[DataFile] = {
    require(spec.sortCols.nonEmpty, "sortCols must name at least one column")
    Files.createDirectories(metaDir(tableDir))
    val commitId = java.util.UUID.randomUUID().toString.take(12)
    val rel = s"data/c-$commitId"
    val dataPath = Paths.get(tableDir, rel)
    val tmpName = s"graft_snapb_${commitId.replace("-", "")}"
    import org.apache.spark.sql.functions.col
    df.repartition(spec.buckets, col(spec.bucketCol))
      .write.format("parquet").option("path", dataPath.toString)
      .bucketBy(spec.buckets, spec.bucketCol)
      .sortBy(spec.sortCols.head, spec.sortCols.tail: _*)
      .saveAsTable(tmpName)
    spark.sql(s"DROP TABLE $tmpName")
    listParquet(spark, dataPath, statsCols).map {
      case (name, rows, bytes, st) => DataFile(s"$rel/$name", rows, bytes, st)
    }
  }

  /** Row-level DELETE by key (the Iceberg equality-delete analog — the
    * takedown / right-to-be-forgotten path a 100 TB corpus must support
    * without rewriting petabytes): `keys`' `keyCol` column is written as
    * an immutable tombstone file and a "delete" snapshot is published —
    * data files are NOT touched, the commit is O(|keys|) regardless of
    * table size. Readers apply tombstones as an anti-join; a key
    * re-inserted by a LATER append survives (sequence semantics via
    * [[DataFile.addedAt]]), and deleting an absent key is a no-op.
    * Tombstones accumulate until a [[compact]] rewrite consumes them;
    * reads stay correct either way, compaction restores read speed.
    * Returns the delete snapshot. */
  def deleteKeys(spark: SparkSession, tableDir: String, keyCol: String,
                 keys: DataFrame, tag: Option[String] = None): Snapshot = {
    val headId = currentSnapshotId(tableDir).getOrElse(
      sys.error(s"$tableDir has no snapshots to delete from"))
    val head = snapshot(tableDir, headId)
    requireKeyInHeadSchema(tableDir, head, keyCol, "delete")
    requireKeyInLiveFiles(spark, tableDir, head, keyCol, "delete")
    val dels = writeTombstoneDir(spark, tableDir, keyCol, keys)
    publishLoop(tableDir, "delete", Nil, tag, None, None, dels)
  }

  /** The tombstoned key column must exist in the HEAD schema — a key
    * absent from older files reads as null there, and nulls never match
    * an equi-anti-join, so the operation would silently delete nothing. */
  private def requireKeyInHeadSchema(tableDir: String, head: Snapshot,
                                     keyCol: String, op: String): Unit =
    head.schemaJson.foreach { json =>
      val schema = structFromJson(json)
      require(schema.fieldNames.contains(keyCol),
        s"$op key column '$keyCol' is not a column of $tableDir " +
          s"(schema: ${schema.fieldNames.mkString(", ")})")
    }

  /** The schema-EVOLUTION twin of [[requireKeyInHeadSchema]]: the key
    * column must be PHYSICALLY present in every live data file, not just
    * the head schema — appends may add columns, so a key column added
    * mid-table is null in every pre-evolution file, and null never
    * matches the tombstone anti-join: those rows would silently survive
    * the delete/upsert. All part files of one commit share a schema
    * (written from one frame), so ONE parquet footer per distinct
    * `addedAt` group decides — a driver-side metadata read per retained
    * commit, milliseconds each. */
  private def requireKeyInLiveFiles(spark: SparkSession, tableDir: String,
                                    head: Snapshot, keyCol: String,
                                    op: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    head.files.groupBy(_.addedAt).toSeq.sortBy(_._1).foreach { case (at, fs) =>
      // one footer decides for a post-upgrade commit group; LEGACY
      // manifests parse every file with addedAt 0 — MIXED commits share
      // that group, so each of its files must be checked individually
      val sample = if (at == 0L) fs else Seq(fs.head)
      sample.foreach { lf =>
        val path = new org.apache.hadoop.fs.Path(
          Paths.get(tableDir, lf.path).toString)
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(path, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        val has = try r.getFooter.getFileMetaData.getSchema.containsField(keyCol)
          finally r.close()
        require(has,
          s"$op key column '$keyCol' is missing from the data files " +
            s"committed at snapshot $at of $tableDir (schema evolution " +
            "added it later) — their rows would read it as null and " +
            "silently survive the anti-join; compact() first to " +
            "materialize the column everywhere, then retry")
      }
    }
  }

  /** Write `keys`' distinct `keyCol` values as an immutable tombstone
    * parquet dir and return its [[DeleteFile]]s (shared by [[deleteKeys]]
    * and [[upsert]] so the two can never diverge). */
  private def writeTombstoneDir(spark: SparkSession, tableDir: String,
                                keyCol: String, keys: DataFrame): Seq[DeleteFile] = {
    Files.createDirectories(metaDir(tableDir))
    val commitId = java.util.UUID.randomUUID().toString.take(12)
    val rel = s"data/d-$commitId"
    val dataPath = Paths.get(tableDir, rel)
    keys.select(keyCol).distinct().write.parquet(dataPath.toString)
    listParquet(spark, dataPath, Nil).map {
      case (name, rows, bytes, _) => DeleteFile(s"$rel/$name", keyCol, rows, bytes, 0L)
    }
  }

  /** Atomic UPSERT — the Iceberg `MERGE INTO ... WHEN MATCHED THEN UPDATE
    * WHEN NOT MATCHED THEN INSERT` analog with whole-row latest-wins
    * semantics at `keyCol` granularity: ONE commit that both tombstones
    * the batch's key values against every strictly-older data file and
    * adds the batch's rows as new data files. The composition
    * [[deleteKeys]]-then-[[append]] has a visible intermediate state
    * (readers between the two commits see the keys GONE) and no atomicity
    * (a crash between them loses the re-insert); upsert closes both — the
    * manifest publish is the single commit point for delete + insert
    * together. Sequence semantics make it correct for free: the tombstone
    * and the new data files carry the SAME snapshot id, and a tombstone
    * applies only to files strictly older than it, so the batch's own rows
    * survive while every older version of the keys dies.
    *
    * A key may map to several rows (an order's line items, an entity's
    * events): the upsert replaces ALL of a key's rows with the batch's
    * rows for that key. The tombstoned key set is read back from the
    * WRITTEN files (one column-pruned scan), never recomputed from `df` —
    * a non-deterministic input could otherwise divorce the delete set from
    * the inserted rows. A bucketed head keeps its layout (the batch is
    * written bucket-transformed under the same spec); [[readBucketed]]
    * refuses the resulting mixed-age state until a [[compact]] consumes
    * the tombstones — [[read]]'s split plan stays exact throughout.
    * Incremental consumers traverse upsert commits: [[changes]] delivers
    * the batch's rows and applies the tombstone to the window's own
    * earlier appends; [[changelog]] additionally emits the replaced rows'
    * pre-images as deletes. */
  def upsert(spark: SparkSession, tableDir: String, keyCol: String,
             df: DataFrame, tag: Option[String] = None,
             statsCols: Seq[String] = Nil): Snapshot = {
    val headId = currentSnapshotId(tableDir).getOrElse(
      sys.error(s"$tableDir has no snapshots to upsert into (use commit)"))
    val head = snapshot(tableDir, headId)
    require(df.schema.fieldNames.contains(keyCol),
      s"upsert key column '$keyCol' is not a column of the batch " +
        s"(columns: ${df.schema.fieldNames.mkString(", ")})")
    // ...and of the HEAD schema AND physically of every live file: older
    // files would read an absent key as null, the tombstone anti-join
    // would match nothing, and every old version would silently survive
    // beside the batch
    requireKeyInHeadSchema(tableDir, head, keyCol, "upsert")
    requireKeyInLiveFiles(spark, tableDir, head, keyCol, "upsert")
    val newFiles = head.bucketSpec match {
      case Some(spec) => writeBucketedCommitDir(spark, tableDir, df, spec, statsCols)
      case None => writeCommitDir(spark, tableDir, df, statsCols)
    }
    // an empty batch merges nothing: an idle zero-file commit (commit()'s
    // idle-micro-batch convention), not a crash in the tombstone read
    if (newFiles.isEmpty)
      return publishLoop(tableDir, "upsert", Nil, tag, Some(df.schema.json),
        head.bucketSpec, Nil)
    // tombstone the batch's keys, read back from the WRITTEN files — a
    // non-deterministic input could otherwise divorce the delete set from
    // the inserted rows
    val dels = writeTombstoneDir(spark, tableDir, keyCol,
      readFiles(spark, tableDir, newFiles, Some(df.schema.json)))
    publishLoop(tableDir, "upsert", newFiles, tag, Some(df.schema.json),
      head.bucketSpec, dels)
  }

  /** Rewrite the CURRENT snapshot's logical state as one fresh `replace`
    * commit (Iceberg's `rewrite_data_files`): tombstones are materialized
    * and dropped, a streaming ingest's pile of per-micro-batch small files
    * collapses into full-size ones, and a bucketed table is rewritten
    * bucket-transformed (the head's [[BucketSpec]] is preserved, so
    * post-compaction [[readBucketed]] is exchange-free again even after
    * post-delete appends fragmented the sequence groups). Time travel to
    * pre-compaction snapshots keeps working until [[expireSnapshots]];
    * `targetFiles > 0` coalesces an unbucketed rewrite to that many files. */
  def compact(spark: SparkSession, tableDir: String, targetFiles: Int = 0,
              tag: Option[String] = None, statsCols: Seq[String] = Nil): Snapshot =
    compactFrom(spark, tableDir,
      currentSnapshotId(tableDir).getOrElse(sys.error(s"$tableDir has no snapshots")),
      targetFiles, tag, statsCols)

  /** [[compact]] from an explicit snapshot id, with the conflict check
    * made visible: the rewrite is computed from `fromId` and REFUSES to
    * publish if the head moved past it meanwhile (a concurrent append's
    * rows must never be silently dropped by a rewrite computed before
    * they existed — Iceberg's rewrite validation).
    *
    * The published snapshot's operation is `"replace"`, not `"overwrite"`:
    * a compaction changes FILES, never logical rows, so incremental
    * consumers ([[changes]]) traverse it — an overwrite (new content)
    * still breaks incremental history loudly. With `statsCols` empty the
    * rewrite INHERITS the stats columns the source snapshot's files carry
    * (a scheduled compaction must not silently strip the manifest min/max
    * bounds that make range reads and watermarks metadata-only). */
  def compactFrom(spark: SparkSession, tableDir: String, fromId: Long,
                  targetFiles: Int = 0, tag: Option[String] = None,
                  statsCols: Seq[String] = Nil): Snapshot = {
    val snap = snapshot(tableDir, fromId)
    val df = read(spark, tableDir, Some(fromId))
    val st = if (statsCols.nonEmpty) statsCols
             else snap.files.flatMap(_.stats.map(_._1)).distinct
    snap.bucketSpec match {
      case Some(spec) =>
        val newFiles = writeBucketedCommitDir(spark, tableDir, df, spec, st)
        publishLoop(tableDir, "replace", newFiles, tag, Some(df.schema.json),
          Some(spec), Nil, Some(fromId))
      case None =>
        val out = if (targetFiles > 0) df.coalesce(targetFiles) else df
        val newFiles = writeCommitDir(spark, tableDir, out, st)
        publishLoop(tableDir, "replace", newFiles, tag, Some(df.schema.json),
          None, Nil, Some(fromId))
    }
  }

  /** [[compact]] with an explicit SORT ORDER — Iceberg's
    * `rewrite_data_files` with a sort_order: the rewrite range-partitions
    * on `sortCols` and sorts within each file, so every output file
    * covers a narrow contiguous slice of the leading column and the
    * manifest min/max stats (recorded for `sortCols` plus whatever the
    * source files carried) become TIGHT — [[readRange]] file skipping
    * recovers after an out-of-order/fragmented ingest scattered each
    * commit's values across the whole range. Refused on a bucketed head:
    * that layout IS the table's clustering ([[compact]] preserves it);
    * changing it is an explicit `commitBucketed` overwrite. Same
    * `replace` semantics and moved-head refusal as [[compactFrom]]. */
  def compactSorted(spark: SparkSession, tableDir: String,
                    sortCols: Seq[String], targetFiles: Int,
                    tag: Option[String] = None): Snapshot = {
    require(sortCols.nonEmpty, "compactSorted needs at least one sort column")
    require(targetFiles >= 1, s"targetFiles must be >= 1, got $targetFiles")
    val fromId = currentSnapshotId(tableDir).getOrElse(
      sys.error(s"$tableDir has no snapshots"))
    val snap = snapshot(tableDir, fromId)
    require(snap.bucketSpec.isEmpty,
      s"$tableDir carries a bucket layout — that layout IS its clustering " +
        "(compact() preserves it); change it with a commitBucketed overwrite")
    val df = read(spark, tableDir, Some(fromId))
    import org.apache.spark.sql.functions.col
    val out = df.repartitionByRange(targetFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
    val st = (snap.files.flatMap(_.stats.map(_._1)) ++ sortCols).distinct
    val newFiles = writeCommitDir(spark, tableDir, out, st)
    publishLoop(tableDir, "replace", newFiles, tag, Some(df.schema.json),
      None, Nil, Some(fromId))
  }

  /** [[compactSorted]]'s two-dimensional sibling — the Iceberg/Delta
    * `ZORDER BY` analog: rows are rewritten in Morton (Z-curve) order of
    * the two columns ([[graft.functions.ZOrder]] — pure codegen'd bit
    * arithmetic, corpus bounds from ONE single-row aggregate), so every
    * output file has a tight bounding box in BOTH dimensions at once and
    * [[readRangeMulti]] prunes on either column or their intersection —
    * where a lexicographic sort serves only its leading column. The
    * 100 TB use: an events corpus queried both entity-selectively and
    * time-selectively keeps constant-files-touched on BOTH access paths
    * after one scheduled rewrite. Columns must cast to long (ints,
    * longs, timestamps); only their ORDER matters, so any monotone unit
    * works. */
  def compactZOrdered(spark: SparkSession, tableDir: String,
                      colA: String, colB: String, targetFiles: Int,
                      tag: Option[String] = None): Snapshot = {
    require(targetFiles >= 1, s"targetFiles must be >= 1, got $targetFiles")
    val fromId = currentSnapshotId(tableDir).getOrElse(
      sys.error(s"$tableDir has no snapshots"))
    val snap = snapshot(tableDir, fromId)
    require(snap.bucketSpec.isEmpty,
      s"$tableDir carries a bucket layout — that layout IS its clustering " +
        "(compact() preserves it); change it with a commitBucketed overwrite")
    val df = read(spark, tableDir, Some(fromId))
    import org.apache.spark.sql.functions.{col, min => fmin, max => fmax}
    // refuse non-castable dimensions up front: under non-ANSI SQL a
    // string column casts to all-null longs, and the all-null fallback
    // below would silently perform an UNCLUSTERED rewrite while the
    // caller believes the table is Morton-ordered
    Seq(colA, colB).foreach { cName =>
      val dt = df.schema(cName).dataType
      require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType] ||
        dt == org.apache.spark.sql.types.TimestampType,
        s"compactZOrdered needs numeric or timestamp dimensions; " +
          s"'$cName' is ${dt.simpleString}")
    }
    val a = col(colA).cast("long"); val b = col(colB).cast("long")
    // single-row bounded collect: the corpus bounds that normalize the
    // two dimensions into the Morton domain
    val bounds = df.agg(fmin(a), fmax(a), fmin(b), fmax(b)).collect()(0)
    // empty table, or a dimension that is entirely null: there is nothing
    // to cluster on — fall back to a plain rewrite instead of NPE-ing on
    // the missing bound (rows with SOME nulls are fine: min/max ignore
    // them and the null Morton keys sort into one partition)
    if ((0 until 4).exists(bounds.isNullAt))
      return compactFrom(spark, tableDir, fromId, targetFiles, tag)
    val z = graft.functions.ZOrder.mortonNormalized(
      a, bounds.getLong(0), bounds.getLong(1),
      b, bounds.getLong(2), bounds.getLong(3))
    val out = df.withColumn("__zorder", z)
      .repartitionByRange(targetFiles, col("__zorder"))
      .sortWithinPartitions(col("__zorder"))
      .drop("__zorder")
    val st = (snap.files.flatMap(_.stats.map(_._1)) ++ Seq(colA, colB)).distinct
    val newFiles = writeCommitDir(spark, tableDir, out, st)
    publishLoop(tableDir, "replace", newFiles, tag, Some(df.schema.json),
      None, Nil, Some(fromId))
  }

  /** Optimistic publish loop shared by [[commit]], [[commitBucketed]],
    * [[deleteKeys]] and [[compactFrom]]: re-reads the head each attempt so
    * a lost race stacks this commit's files on top of the winner's, and
    * enforces layout compatibility INSIDE the loop (the winner may have
    * changed the head's spec). New data/delete files are stamped with the
    * candidate snapshot id (`DataFile.addedAt`) — re-stamped on every
    * retry, so the sequence-number ordering deletes rely on is exact even
    * after lost races. `expectedHead` (compaction's validation, Iceberg's
    * rewrite conflict check) refuses to publish when the head moved past
    * it: a rewrite computed from snapshot N must not silently drop a
    * concurrent commit N+1's rows. */
  private def publishLoop(tableDir: String, operation: String,
                          newFiles: Seq[DataFile], tag: Option[String],
                          schemaJson: Option[String],
                          bucketSpec: Option[BucketSpec],
                          newDeletes: Seq[DeleteFile] = Nil,
                          expectedHead: Option[Long] = None): Snapshot = {
    var attempt = 0
    while (true) {
      attempt += 1
      require(attempt <= 100, s"commit to $tableDir lost 100 publish races; aborting")
      val head = currentSnapshotId(tableDir)
      expectedHead.foreach { e =>
        require(head.contains(e),
          s"$tableDir moved to snapshot ${head.getOrElse(0L)} while a rewrite " +
            s"of snapshot $e was in flight — publishing would drop the " +
            "concurrent commit's rows; re-run the rewrite from the new head")
      }
      val headSnap =
        if (operation == "overwrite" || operation == "replace") None
        else head.map(snapshot(tableDir, _))
      if (operation == "append" || operation == "upsert") headSnap.foreach { h =>
        require(h.bucketSpec == bucketSpec,
          s"$operation layout mismatch on $tableDir: head snapshot ${h.id} has " +
            s"bucketSpec=${h.bucketSpec}, this commit has $bucketSpec — " +
            s"${operation}s must preserve the table's layout (overwrite resets it)")
        // schema evolution rule (Iceberg's): an append may ADD columns —
        // older files read the new column as null — but never drop or
        // retype one: the manifest schema drives every read, so a
        // narrower/retyped append would corrupt reads of the OLD files
        for (pj <- h.schemaJson; nj <- schemaJson) {
          val prev = structFromJson(pj); val next = structFromJson(nj)
          prev.fields.foreach { f =>
            val nf = next.fields.find(_.name == f.name)
            require(nf.nonEmpty,
              s"$operation to $tableDir drops column '${f.name}' — it may " +
                "add columns, never drop them (overwrite replaces the schema)")
            require(nf.get.dataType == f.dataType,
              s"$operation to $tableDir retypes column '${f.name}' from " +
                s"${f.dataType.simpleString} to ${nf.get.dataType.simpleString} — " +
                "it may add columns, never retype them")
          }
        }
      }
      val nextId = head.getOrElse(0L) + 1
      val stamped = newFiles.map(_.copy(addedAt = nextId))
      val parentFiles = headSnap.map(_.files).getOrElse(Nil)
      val parentDeletes = headSnap.map(_.deletes).getOrElse(Nil)
      // the commit's schema rides in the manifest (the Iceberg metadata
      // analog) so a zero-file snapshot — an idle micro-batch, an
      // overwrite with an empty frame — still reads as a typed empty table
      val snap = operation match {
        case "append" =>
          // appends inherit the head's tombstones: they still apply to the
          // OLDER files; the newly stamped files are younger, so survive
          Snapshot(nextId, head, operation, System.currentTimeMillis(),
            parentFiles ++ stamped, tag, schemaJson, bucketSpec, parentDeletes)
        case "overwrite" | "replace" =>
          // both replace the complete live state — tombstones are consumed
          // and the layout resets to the provided spec; they differ only in
          // MEANING: an overwrite carries new content (changes() refuses to
          // cross it), a replace rewrites files over identical logical rows
          // (compaction — changes() traverses it)
          Snapshot(nextId, head, operation, System.currentTimeMillis(),
            stamped, tag, schemaJson, bucketSpec, Nil)
        case "delete" =>
          // data files, layout and schema are untouched; only tombstones
          // accumulate (stamped with THIS snapshot's id — they apply to
          // every current file, none of any later append's)
          Snapshot(nextId, head, operation, System.currentTimeMillis(),
            parentFiles, tag, headSnap.flatMap(_.schemaJson),
            headSnap.flatMap(_.bucketSpec),
            parentDeletes ++ newDeletes.map(_.copy(addedAt = nextId)))
        case "upsert" =>
          // delete + insert under ONE commit point: the tombstone and the
          // new data files carry the same id, so the tombstone (strictly-
          // older rule) kills every older version of the keys while the
          // batch's own rows survive
          Snapshot(nextId, head, operation, System.currentTimeMillis(),
            parentFiles ++ stamped, tag, schemaJson, bucketSpec,
            parentDeletes ++ newDeletes.map(_.copy(addedAt = nextId)))
        case other => sys.error(s"unsupported operation: $other")
      }
      if (publish(tableDir, snap)) return snap
    }
    sys.error("unreachable")
  }

  /** Atomically publish a manifest; false when snapshot `snap.id` already
    * exists (a concurrent committer won — refresh and retry). Exposed
    * within the package so the race branch is directly unit-testable. */
  private[sources] def publish(tableDir: String, snap: Snapshot): Boolean = {
    val target = manifestPath(tableDir, snap.id)
    val tmp = Files.createTempFile(metaDir(tableDir), ".snap-staging", ".json")
    Files.write(tmp, renderManifest(snap).getBytes("UTF-8"))
    // hard-link the staged file into place: link(2) fails with EEXIST
    // atomically, so the first publisher of this id wins. (A rename —
    // Files.move with ATOMIC_MOVE — would silently REPLACE the winner's
    // manifest on POSIX.)
    try { Files.createLink(target, tmp); true }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }
    finally Files.deleteIfExists(tmp)
  }

  /** Read the table at a snapshot (default: latest). The file list is
    * resolved HERE, once — the returned DataFrame is immune to concurrent
    * commits for its whole lifetime. A zero-file snapshot (an idle
    * micro-batch commit, an overwrite with an empty frame) reads as a
    * typed empty table via the schema stored in its manifest. Bucketing
    * metadata (if any) is NOT attached on this path — use
    * [[readBucketed]] when the downstream plan should exploit it. */
  def read(spark: SparkSession, tableDir: String,
           snapshotId: Option[Long] = None): DataFrame = {
    val id = snapshotId.orElse(currentSnapshotId(tableDir)).getOrElse(
      sys.error(s"$tableDir has no snapshots"))
    val snap = snapshot(tableDir, id)
    if (snap.files.isEmpty) emptyWithSchema(spark, tableDir, snap)
    else readWithDeletes(spark, tableDir, snap.files, snap.deletes, snap.schemaJson)
  }

  /** Scan `files` with equality-delete tombstones applied under sequence
    * semantics: a tombstone applies only to data files strictly older than
    * it, so group the files by their applicable tombstone set (always a
    * SUFFIX of the delete list ordered by addedAt — at most
    * #delete-snapshots + 1 groups, a manifest-sized driver loop) and
    * anti-join each group against exactly its suffix. Tombstone scans
    * carry accurate sizeInBytes from their parquet footers, so Spark
    * auto-broadcasts small delete sets — the common takedown case costs no
    * shuffle of the data side. Re-inserted rows (appended after the
    * delete) land in a group with an empty suffix and pass through
    * untouched. Shared by [[read]] (full live set) and [[changes]] (the
    * window's added files against the window's tombstones). */
  private def readWithDeletes(spark: SparkSession, tableDir: String,
                              files: Seq[DataFile], deletes: Seq[DeleteFile],
                              schemaJson: Option[String]): DataFrame =
    if (deletes.isEmpty) readFiles(spark, tableDir, files, schemaJson)
    else {
      val grouped = files.groupBy(f =>
        deletes.map(_.addedAt).filter(_ > f.addedAt).toSet)
      grouped.toSeq.sortBy(_._1.size).map { case (applIds, fs) =>
        applyDeletes(spark, tableDir,
          readFiles(spark, tableDir, fs, schemaJson),
          deletes.filter(d => applIds(d.addedAt)))
      }.reduce(_ unionByName _)
    }

  /** Anti-join `base` against the given tombstone files, one join per
    * distinct key column. Duplicate keys across tombstone files are
    * harmless (anti-join ignores right-side multiplicity), so the files
    * are scanned as-is — a plain parquet relation whose footer-accurate
    * size lets Spark pick a broadcast anti-join for small delete sets. */
  private def applyDeletes(spark: SparkSession, tableDir: String,
                           base: DataFrame, dels: Seq[DeleteFile]): DataFrame =
    dels.groupBy(_.keyCol).toSeq.sortBy(_._1).foldLeft(base) {
      case (df, (keyCol, ds)) =>
        val tomb = spark.read.parquet(
          ds.map(d => Paths.get(tableDir, d.path).toString): _*)
        df.join(tomb, Seq(keyCol), "left_anti")
    }

  /** Read a BUCKETED snapshot with its layout metadata attached: scans
    * report HashPartitioning(bucketCol, buckets), so entity-keyed joins /
    * aggregations / windows (including the custom as-of merge join) plan
    * with ZERO exchanges — over a PINNED snapshot, immune to concurrent
    * appends. This is the pin + layout composition: snapshot isolation
    * decides WHICH files exist; the bucket spec decides how they're
    * co-located.
    *
    * Mechanics: Spark attaches bucket metadata only through a catalog
    * table over a LOCATION, which cannot express "these files only" — so
    * the snapshot's exact file list is materialized as a HARD-LINK farm
    * under `views/snap-<id>/` (same filesystem, zero copy, immutable
    * sources) and the bucketing DDL is declared over that directory.
    * View building is idempotent and race-safe: links are first-writer-
    * wins against identical targets, a completion marker gates reuse, and
    * a crash mid-build just re-links (the per-snapshot file set is
    * immutable). Views are derived state — [[expireSnapshots]] deletes a
    * view with its snapshot.
    *
    * Multiple files per bucket (a multi-commit table) keep the
    * zero-exchange property — Spark groups a bucket's files into one scan
    * partition — but the per-bucket SORT order only holds within each
    * commit's file, so residual sorts are partition-local (cheap, no
    * shuffle feeding them). Do not enable
    * `spark.sql.legacy.bucketedTableScan.outputOrdering` over a
    * multi-commit view; it assumes one file per bucket. */
  def readBucketed(spark: SparkSession, tableDir: String,
                   snapshotId: Option[Long] = None): DataFrame = {
    val id = snapshotId.orElse(currentSnapshotId(tableDir)).getOrElse(
      sys.error(s"$tableDir has no snapshots"))
    val snap = snapshot(tableDir, id)
    val spec = snap.bucketSpec.getOrElse(sys.error(
      s"snapshot $id of $tableDir carries no bucket layout — " +
        "commit with commitBucketed, or use read()"))
    if (snap.files.isEmpty) return emptyWithSchema(spark, tableDir, snap)
    // Tombstones over a bucketed view: the view is one directory, so the
    // per-sequence-group split read() performs cannot be expressed here.
    // The uniform case — every tombstone applies to every file, i.e. no
    // append landed after the newest delete — is handled by anti-joining
    // the whole view (a broadcast anti-join for small delete sets, which
    // preserves the scan's bucket partitioning: entity-keyed work stays
    // exchange-free). The fragmented case is refused with the remedy:
    // compact() consumes the tombstones and restores the uniform layout.
    if (snap.deletes.nonEmpty) {
      val oldestDelete = snap.deletes.map(_.addedAt).min
      require(snap.files.forall(_.addedAt < oldestDelete),
        s"snapshot $id of $tableDir has data files not older than its " +
          "oldest tombstone — sequence-correct deletes need the split read() " +
          "plan, which a bucketed view cannot express; run compact() " +
          "to consume the tombstones, then readBucketed is exchange-free again")
    }
    val view = viewDir(tableDir, id)
    val marker = view.resolve("__view_complete")
    if (!Files.exists(marker)) {
      Files.createDirectories(view)
      snap.files.foreach { f =>
        val src = Paths.get(tableDir, f.path)
        // flat farm: names get the commit-dir prefix so two commits'
        // part files can never collide; the trailing _NNNNN bucket-id
        // suffix (what the bucketed scan keys on) is preserved
        val cdir = f.path.split('/')(1)
        val link = view.resolve(s"$cdir-${Paths.get(f.path).getFileName}")
        try Files.createLink(link, src)
        catch { case _: java.nio.file.FileAlreadyExistsException => () }
      }
      try Files.createFile(marker)
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
    }
    val name = "graft_snapview_" + TableSource.pathKey(s"$tableDir@$id")
    TableSource.registerBucketed(spark, name, view.toString,
      spec.buckets, spec.bucketCol, spec.sortCols,
      snap.schemaJson.map(structFromJson(_).toDDL))
    applyDeletes(spark, tableDir, spark.table(name), snap.deletes)
  }

  /** Incremental append scan: the rows in files added after
    * `fromExclusive` up to `toInclusive` that are still LIVE at
    * `toInclusive`. Well-defined across `append` commits (files are only
    * ever added) AND across `delete` commits — a takedown adds no data
    * files, so the file-add diff stays exact, and the window's tombstones
    * are applied to the window's own earlier appends under the usual
    * sequence semantics (appended at 5, deleted at 6, read at 7 ⇒ not
    * delivered). Rows appended BEFORE the window and deleted inside it are
    * NOT re-reported: an append scan carries no retraction channel —
    * consumers that maintain derived state compose the takedown in
    * explicitly ([[graft.pipeline.IncrementalDedup.retract]], oracled with
    * a mid-stream takedown by q123). `replace` commits (compaction) are
    * traversed too — a rewrite changes files, not logical rows, so the
    * scheduled maintenance pass never wedges a consumer — and so are
    * `upsert` commits (the batch's rows are delivered; the replaced keys'
    * tombstone applies to the window's own earlier appends like any other
    * window takedown). Only an `overwrite` or `rollback` boundary is
    * refused — new CONTENT cannot be represented as a file-add diff
    * (Iceberg's incremental scan has the same restriction). */
  /** Load an incremental window's snapshot chain (`fromExclusive` ..
    * `toInclusive`) and refuse `overwrite`/`rollback` boundaries — new
    * CONTENT cannot be represented as a file-level diff, so both
    * [[changes]] and [[changelog]] share this validation (Iceberg's
    * incremental scan has the same restriction). */
  private def incrementalChain(tableDir: String, fromExclusive: Long,
                               toInclusive: Long): Seq[Snapshot] = {
    require(fromExclusive < toInclusive,
      s"empty snapshot range: ($fromExclusive, $toInclusive]")
    val chain = (fromExclusive to toInclusive)
      .map(id => snapshot(tableDir, id))
    chain.tail.foreach { s =>
      require(s.operation != "overwrite" && s.operation != "rollback",
        s"snapshot ${s.id} is a ${s.operation} — new CONTENT invalidates " +
          "incremental history (Iceberg's incremental scan has the same " +
          "restriction); reset the consumer's cursor and re-read")
    }
    chain
  }

  /** One commit's added data files: the path diff against its parent —
    * exact for legacy manifests (addedAt = 0) and across `replace`
    * rewrites, whose files are existing data in new clothing. Non-empty
    * only for `append` and `upsert` commits. */
  private def addedFiles(prev: Snapshot, cur: Snapshot): Seq[DataFile] =
    if (cur.operation != "append" && cur.operation != "upsert") Nil
    else {
      val before = prev.files.map(_.path).toSet
      cur.files.filterNot(f => before(f.path))
    }

  def changes(spark: SparkSession, tableDir: String,
              fromExclusive: Long, toInclusive: Long): DataFrame = {
    val chain = incrementalChain(tableDir, fromExclusive, toInclusive)
    val window = chain.tail
    // per-commit formulation (Iceberg's incremental append scan): each
    // APPEND commit's added files — the path diff against its parent's
    // file list, which stays exact for legacy manifests whose files parse
    // with addedAt = 0 (an addedAt == id filter would silently return an
    // EMPTY diff for pre-upgrade commits, the worst failure mode for a
    // cursor consumer) — are read directly: they are immutable on disk
    // until their manifest expires, so this stays exact even when a later
    // `replace` (compaction) in the window rewrote the live set: the
    // replace's files are EXISTING data in new clothing and are skipped
    // entirely, which is what lets scheduled compaction run without
    // wedging cursor consumers
    // upserts add files the same way appends do — their replaced-row
    // semantics ride in the tombstone collected below
    val added = chain.sliding(2).flatMap {
      case Seq(prev, cur) => addedFiles(prev, cur)
      case _ => Nil
    }.toSeq
    val to = window.last
    // a window can add zero files (idle micro-batches, delete/replace
    // only): the diff is legitimately empty — a typed frame, not a refusal
    if (added.isEmpty) emptyWithSchema(spark, tableDir, to)
    else {
      // the window's takedowns apply to the window's own earlier appends
      // (sequence semantics; pre-window tombstones never touch them) —
      // upsert tombstones included: a key appended at 5 and upserted at 6
      // is delivered only in its version-6 form
      val winDeletes = window
        .filter(s => s.operation == "delete" || s.operation == "upsert")
        .flatMap(s => s.deletes.filter(_.addedAt == s.id))
      readWithDeletes(spark, tableDir, added, winDeletes, to.schemaJson)
    }
  }

  /** CDC CHANGELOG scan — the Iceberg `create_changelog_view` analog:
    * every row-level change between two snapshots, as the table's row
    * schema plus `_change_type` (`"insert"` | `"delete"`) and
    * `_commit_id` (the snapshot that caused it). Per commit in the
    * window:
    *
    *  - `append`: its added files' rows as inserts — even when a LATER
    *    window commit deletes them again (unlike [[changes]], a changelog
    *    reports history, not surviving state: the later delete emits its
    *    own records);
    *  - `delete`: the tombstoned rows' PRE-IMAGES as deletes — the rows
    *    live at the parent snapshot that match the tombstone keys (rows
    *    already dead, or absent keys, emit nothing);
    *  - `upsert`: the replaced keys' pre-images as deletes, then the
    *    batch's rows as inserts (latest-wins MERGE decomposed into its
    *    change stream);
    *  - `replace` (compaction): nothing — files changed, rows didn't;
    *  - `overwrite` / `rollback`: refused, as in [[changes]].
    *
    * The apply-invariant (specs assert it): state at `fromExclusive`
    * MINUS the delete records PLUS the insert records == state at
    * `toInclusive`, as multisets of full rows. Pre-image reads cost one
    * parent-state scan per delete/upsert commit, semi-joined against the
    * (broadcast-sized) tombstone keys — the same cost profile as Iceberg's
    * changelog with pre-images. Schema evolution inside the window reads
    * older commits' missing columns as null (`unionByName` with
    * allowMissingColumns). */
  def changelog(spark: SparkSession, tableDir: String,
                fromExclusive: Long, toInclusive: Long): DataFrame = {
    val chain = incrementalChain(tableDir, fromExclusive, toInclusive)
    import org.apache.spark.sql.functions.lit
    def stamp(df: DataFrame, kind: String, id: Long): DataFrame =
      df.withColumn("_change_type", lit(kind))
        .withColumn("_commit_id", lit(id))
    val pieces = chain.sliding(2).flatMap { case Seq(prev, cur) =>
      val inserts: Seq[DataFrame] = addedFiles(prev, cur) match {
        case Nil => Nil
        case added => Seq(stamp(
          readFiles(spark, tableDir, added, cur.schemaJson), "insert", cur.id))
      }
      val deletes: Seq[DataFrame] = cur.operation match {
        case "delete" | "upsert" =>
          val newDels = cur.deletes.filter(_.addedAt == cur.id)
          if (newDels.isEmpty || prev.files.isEmpty) Nil
          else {
            val parentLive = readWithDeletes(spark, tableDir,
              prev.files, prev.deletes, prev.schemaJson)
            // one semi-join per key column, each against the rows the
            // PREVIOUS key columns didn't already claim — a row matching
            // several of one commit's tombstones still emits exactly once
            val (_, preImages) = newDels.groupBy(_.keyCol).toSeq.sortBy(_._1)
              .foldLeft((parentLive, Seq.empty[DataFrame])) {
                case ((remaining, acc), (kc, ds)) =>
                  val keys = spark.read.parquet(
                    ds.map(d => Paths.get(tableDir, d.path).toString): _*)
                  (remaining.join(keys, Seq(kc), "left_anti"),
                    acc :+ remaining.join(keys, Seq(kc), "left_semi"))
              }
            preImages.map(stamp(_, "delete", cur.id))
          }
        case _ => Nil
      }
      deletes ++ inserts
    }.toSeq
    if (pieces.isEmpty)
      stamp(emptyWithSchema(spark, tableDir, chain.last), "", 0L)
        .where(lit(false))
    else pieces.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Typed empty frame for a snapshot with no (selected) data files, from
    * the schema its manifest recorded at commit time. Pre-schema legacy
    * manifests (no `schema` field) can't produce one — refuse loudly. */
  private def emptyWithSchema(spark: SparkSession, tableDir: String,
                              snap: Snapshot): DataFrame = {
    val json = snap.schemaJson.getOrElse(sys.error(
      s"snapshot ${snap.id} of $tableDir lists no data files and its " +
        "manifest predates schema recording — cannot type an empty read"))
    val schema = org.apache.spark.sql.types.DataType.fromJson(json)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  private def refPath(tableDir: String, name: String): Path =
    metaDir(tableDir).resolve(s"ref-$name.txt")

  /** Publish an immutable NAME for a snapshot (Iceberg's tag refs) — the
    * reproducible-release primitive a training-data pipeline needs:
    * "run R trained on corpus@v3" is only auditable if v3 can neither
    * move nor expire. A tagged snapshot is retained by [[expireSnapshots]]
    * beyond `keepLast` (manifest AND data files); [[dropTag]] releases it
    * back to normal retention. Tags are immutable: re-creating an existing
    * name is refused unless it already points at the same snapshot (so a
    * replayed release job is a no-op, the usual idempotency convention
    * here). Published with the same link(2) first-writer-wins publish as
    * manifests — two concurrent `createTag("v3", ...)` calls cannot both
    * win. Distinct from [[Snapshot.tag]] (a committer's per-commit
    * idempotency token, [[findByTag]]): a ref NAMES a snapshot from the
    * outside and pins it against GC. Returns the tagged snapshot id. */
  def createTag(tableDir: String, name: String,
                snapshotId: Option[Long] = None): Long = {
    require(name.matches("[A-Za-z0-9._-]+"),
      s"tag name must be filename-safe (it keys meta/ref-<name>.txt): $name")
    val id = snapshotId.orElse(currentSnapshotId(tableDir)).getOrElse(
      sys.error(s"$tableDir has no snapshots to tag"))
    require(Files.exists(manifestPath(tableDir, id)),
      s"no snapshot $id in $tableDir (expired or never committed)")
    val target = refPath(tableDir, name)
    val tmp = Files.createTempFile(metaDir(tableDir), ".ref-staging", ".txt")
    Files.write(tmp, id.toString.getBytes("UTF-8"))
    try { Files.createLink(target, tmp) }
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        val existing = resolveTag(tableDir, name).getOrElse(
          sys.error(s"tag '$name' exists but is unreadable in $tableDir"))
        require(existing == id,
          s"tag '$name' already names snapshot $existing in $tableDir — " +
            "tags are immutable; dropTag first or pick a new name")
        return id
    } finally Files.deleteIfExists(tmp)
    // post-publish verify: a concurrent [[expireSnapshots]] that computed
    // its retained set BEFORE this ref landed may have just deleted the
    // snapshot — fail LOUDLY and remove the dangling ref rather than
    // publishing a name that resolves to nothing. (expireSnapshots
    // re-reads the refs immediately before acting — between the two
    // guards the race window is microseconds; a catalog with atomic
    // metadata swaps, e.g. real Iceberg, closes it entirely.)
    if (!Files.exists(manifestPath(tableDir, id))) {
      Files.deleteIfExists(target)
      sys.error(s"snapshot $id of $tableDir was expired while tag '$name' " +
        "was being published — the tag was rolled back; re-create the " +
        "snapshot or tag a retained one")
    }
    id
  }

  /** The snapshot id a tag names, or None. */
  def resolveTag(tableDir: String, name: String): Option[Long] = {
    val p = refPath(tableDir, name)
    if (!Files.exists(p)) None
    else Some(new String(Files.readAllBytes(p), "UTF-8").trim.toLong)
  }

  /** All tags of a table: name -> snapshot id. */
  def tags(tableDir: String): Map[String, Long] = {
    val md = metaDir(tableDir)
    if (!Files.isDirectory(md)) Map.empty
    else {
      val listing = Files.list(md)
      try {
        import scala.jdk.CollectionConverters._
        listing.iterator().asScala
          .map(_.getFileName.toString)
          .filter(n => n.startsWith("ref-") && n.endsWith(".txt"))
          .map(n => n.stripPrefix("ref-").stripSuffix(".txt"))
          .toSeq.sorted
          .flatMap(n => resolveTag(tableDir, n).map(n -> _)).toMap
      } finally listing.close()
    }
  }

  /** Delete a tag, releasing its snapshot back to normal retention (the
    * next [[expireSnapshots]] may reclaim it). Returns false when the tag
    * never existed. */
  def dropTag(tableDir: String, name: String): Boolean =
    Files.deleteIfExists(refPath(tableDir, name))

  private def stagedPath(tableDir: String, stagingId: String): Path =
    metaDir(tableDir).resolve(s"staged-$stagingId.json")

  /** WRITE-AUDIT-PUBLISH, step 1 — stage a commit WITHOUT publishing it
    * (the Iceberg WAP / branch-staging pattern a training-data pipeline
    * runs before every corpus release: write the candidate, run the audit
    * queries against it, and only then make it visible): the data files
    * are written exactly as [[commit]] would, but the manifest lands as
    * `meta/staged-<id>.json` — OUTSIDE the `snap-*` namespace, so head
    * readers, [[snapshotIds]], pins and incremental consumers never see
    * it. [[readStaged]] plans over the candidate state for the audit;
    * [[publishStaged]] atomically turns it into a real snapshot;
    * [[dropStaged]] discards a failed audit. Staged data files are
    * reachable state for [[expireSnapshots]] (a long audit must not lose
    * its candidate to a concurrent GC). A bucketed table stages with its
    * head's spec via `spec` — the publish re-validates layout and schema
    * against whatever head it lands on. Returns the staging id. */
  def stageCommit(spark: SparkSession, tableDir: String, df: DataFrame,
                  operation: String = "append",
                  spec: Option[BucketSpec] = None,
                  statsCols: Seq[String] = Nil): String = {
    require(operation == "append" || operation == "overwrite",
      s"unsupported staged operation: $operation")
    val files = spec match {
      case Some(b) => writeBucketedCommitDir(spark, tableDir, df, b, statsCols)
      case None => writeCommitDir(spark, tableDir, df, statsCols)
    }
    val stagingId = java.util.UUID.randomUUID().toString.take(12)
    // id -1 marks "not yet a snapshot"; parentId records the head at
    // staging time (informational — the publish stacks on the head it
    // finds, re-validating). Staged with the manifest tmp+link discipline
    // so a crash mid-write can't leave a half-written staged manifest.
    val st = Snapshot(-1L, currentSnapshotId(tableDir), operation,
      System.currentTimeMillis(), files, None, Some(df.schema.json), spec)
    val target = stagedPath(tableDir, stagingId)
    val tmp = Files.createTempFile(metaDir(tableDir), ".staged-staging", ".json")
    Files.write(tmp, renderManifest(st).getBytes("UTF-8"))
    try Files.createLink(target, tmp)
    finally Files.deleteIfExists(tmp)
    stagingId
  }

  /** Staging ids currently awaiting audit/publish. */
  def stagedIds(tableDir: String): Seq[String] = {
    val md = metaDir(tableDir)
    if (!Files.isDirectory(md)) Nil
    else {
      val listing = Files.list(md)
      try {
        import scala.jdk.CollectionConverters._
        listing.iterator().asScala
          .map(_.getFileName.toString)
          .filter(n => n.startsWith("staged-") && n.endsWith(".json"))
          .map(n => n.stripPrefix("staged-").stripSuffix(".json"))
          .toSeq.sorted
      } finally listing.close()
    }
  }

  private def stagedManifest(tableDir: String, stagingId: String): Snapshot = {
    val p = stagedPath(tableDir, stagingId)
    require(Files.exists(p),
      s"no staged commit $stagingId in $tableDir (published or dropped?)")
    parseManifest(new String(Files.readAllBytes(p), "UTF-8"))
  }

  /** WRITE-AUDIT-PUBLISH, step 2 — the audit read: the table state that
    * [[publishStaged]] would create if run now. A staged `append` reads
    * the CURRENT head's live state plus the staged files (staged rows
    * treated as newest, so head tombstones don't touch them — exactly the
    * sequence stamp the publish will assign); a staged `overwrite` reads
    * the staged files alone. Head readers remain untouched throughout. */
  def readStaged(spark: SparkSession, tableDir: String,
                 stagingId: String): DataFrame = {
    val st = stagedManifest(tableDir, stagingId)
    val head = currentSnapshotId(tableDir)
    (st.operation, head) match {
      case ("overwrite", _) | ("append", None) =>
        if (st.files.isEmpty) emptyWithSchema(spark, tableDir, st)
        else readFiles(spark, tableDir, st.files, st.schemaJson)
      case ("append", Some(h)) =>
        val hs = snapshot(tableDir, h)
        readWithDeletes(spark, tableDir,
          hs.files ++ st.files.map(_.copy(addedAt = h + 1)),
          hs.deletes, st.schemaJson.orElse(hs.schemaJson))
      case (op, _) => sys.error(s"unsupported staged operation: $op")
    }
  }

  /** WRITE-AUDIT-PUBLISH, step 3 — atomically publish a staged commit as
    * a real snapshot (the audit passed). Runs the same optimistic publish
    * loop as a direct commit — layout and schema validation re-run
    * against whatever head the publish lands on, so a staged append
    * composes with commits that landed during the audit (and is refused
    * if one of them made it incompatible). Idempotent under SEQUENTIAL
    * replay: the published snapshot is tagged `wap:<stagingId>` and a
    * durable receipt (`meta/wap-<id>.txt`) is written right after the
    * publish, so a publisher that crashed between publishing and deleting
    * the staged manifest — or a re-run publish job — resolves to the
    * already-published snapshot instead of double-appending, surviving
    * retention GC and compaction of the published lineage. One publisher
    * per staging id at a time (the single-consumer convention that
    * already governs cursors and tags): two CONCURRENT publishes of the
    * same id can both pass the replay guards before either lands —
    * retry a stuck publish after it dies, not beside it. */
  private def wapReceiptPath(tableDir: String, stagingId: String): Path =
    metaDir(tableDir).resolve(s"wap-$stagingId.txt")

  def publishStaged(tableDir: String, stagingId: String): Snapshot = {
    val wapTag = s"wap:$stagingId"
    val p = stagedPath(tableDir, stagingId)
    val receipt = wapReceiptPath(tableDir, stagingId)
    // replay guard 1 — the durable RECEIPT, written atomically right
    // after the publish and OUTSIDE the expirable manifest log (the
    // SnapshotIngest source-mark pattern): manifest-derived guards alone
    // are defeatable — retention GC expires the wap-tagged snapshot, and
    // a compaction rewrites the staged paths out of every retained
    // manifest — after which a replay would re-append the staged rows.
    if (Files.exists(receipt)) {
      Files.deleteIfExists(p)
      val id = new String(Files.readAllBytes(receipt), "UTF-8").trim.toLong
      return if (Files.exists(manifestPath(tableDir, id))) snapshot(tableDir, id)
        else snapshot(tableDir, currentSnapshotId(tableDir).getOrElse(
          sys.error(s"$tableDir is empty but carries a publish receipt " +
            s"for staged commit $stagingId")))
      // (published earlier; the snapshot itself has since been expired or
      // rewritten — the current head carries its rows)
    }
    // ONE parse of the retained log serves both remaining guards: the wap
    // tag, and staged-path containment for the residual seam (crash in
    // the tiny window between publish and receipt, followed by retention
    // expiring the tagged snapshot — the paths are uuid-unique, so any
    // retained manifest referencing one proves the publish happened)
    val retained = snapshots(tableDir)
    def record(snap: Snapshot): Snapshot = {
      val tmp = Files.createTempFile(metaDir(tableDir), ".wap-staging", ".txt")
      Files.write(tmp, snap.id.toString.getBytes("UTF-8"))
      Files.move(tmp, receipt,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      Files.deleteIfExists(p)
      snap
    }
    retained.reverseIterator.find(_.tag.contains(wapTag)) match {
      case Some(done) => return record(done)
      case None =>
    }
    if (!Files.exists(p))
      sys.error(s"staged commit $stagingId of $tableDir was never staged " +
        "or was dropped (no staged manifest, no receipt, no wap tag)")
    val st = stagedManifest(tableDir, stagingId)
    val stagedPaths = st.files.map(_.path).toSet
    retained.reverseIterator
      .find(_.files.exists(f => stagedPaths(f.path))) match {
      case Some(landed) => record(landed)
      case None =>
        record(publishLoop(tableDir, st.operation, st.files,
          Some(wapTag), st.schemaJson, st.bucketSpec))
    }
  }

  /** Discard a staged commit whose audit failed. Its data files become
    * unreferenced and the next [[expireSnapshots]] reclaims them (after
    * the orphan min-age, like any never-published commit dir). Returns
    * false when the staging id doesn't exist. */
  def dropStaged(tableDir: String, stagingId: String): Boolean =
    Files.deleteIfExists(stagedPath(tableDir, stagingId))

  /** ROLLBACK — republish an older retained snapshot's exact state as the
    * new head (Iceberg's `rollback_to_snapshot`): the bad-commit recovery
    * path. Nothing is rewritten — the new manifest references the target
    * snapshot's files (with their ORIGINAL `addedAt` stamps: re-stamping
    * would break the tombstone sequence semantics they were committed
    * under), tombstones, schema and bucket layout verbatim, so the
    * rollback is a metadata-only O(1) commit and time travel to the
    * rolled-back-over snapshots keeps working until retention expires
    * them. Publishing is refused if the head moves concurrently (a
    * rollback computed against head H must not silently discard a commit
    * H+1 it never saw). Incremental consumers treat the boundary like an
    * overwrite ([[changes]]/[[changelog]] refuse to cross it — content
    * changed in a way no file-add diff represents). */
  def rollbackTo(tableDir: String, id: Long,
                 tag: Option[String] = None): Snapshot = {
    val headId = currentSnapshotId(tableDir).getOrElse(
      sys.error(s"$tableDir has no snapshots"))
    val target = snapshot(tableDir, id)
    if (id == headId) return target
    val next = Snapshot(headId + 1, Some(headId), "rollback",
      System.currentTimeMillis(), target.files, tag, target.schemaJson,
      target.bucketSpec, target.deletes)
    require(publish(tableDir, next),
      s"$tableDir moved past snapshot $headId while rolling back to $id — " +
        "inspect the new head and retry")
    // post-publish verify (the createTag pattern): a concurrent
    // expireSnapshots that computed its retained set BEFORE this rollback
    // landed may be sweeping the target's data files right now — its
    // manifest disappearing is the signal. Withdraw the rollback and fail
    // loudly rather than leave a head referencing deleted files. (GC's
    // own world re-read before its data sweep closes the window from its
    // side; between the two guards the race is microseconds.)
    if (!Files.exists(manifestPath(tableDir, id))) {
      Files.deleteIfExists(manifestPath(tableDir, next.id))
      sys.error(s"snapshot $id of $tableDir was expired while the rollback " +
        "was being published — the rollback was withdrawn; roll back to a " +
        "retained snapshot instead")
    }
    next
  }

  /** Metadata tables — the Iceberg `tbl$snapshots` / `$files` /
    * `$deletes` / `$refs` introspection analog, as DataFrames built
    * driver-side from the manifest log (O(#snapshots) small JSON, no data
    * scan). What an operator inspects before acting: `snapshots` shows
    * the commit history (operation, rows, file/tombstone counts — the
    * fragmentation signal that schedules a compaction), `files` and
    * `deletes` show one snapshot's live data files (with their manifest
    * min/max stats) and pending tombstones, `refs` lists the published
    * release names. `snapshotId` pins `files`/`deletes` to a version
    * (default: current). */
  def metadataTable(spark: SparkSession, tableDir: String, kind: String,
                    snapshotId: Option[Long] = None): DataFrame = {
    val sp = spark; import sp.implicits._
    def pinned: Snapshot = {
      val id = snapshotId.orElse(currentSnapshotId(tableDir)).getOrElse(
        sys.error(s"$tableDir has no snapshots"))
      snapshot(tableDir, id)
    }
    kind match {
      case "snapshots" =>
        snapshots(tableDir).map(s => (s.id, s.parentId, s.operation,
          new java.sql.Timestamp(s.committedAtMs), s.totalRows,
          s.totalBytes, s.files.size.toLong, s.deletes.size.toLong, s.tag))
          .toDF("snapshot_id", "parent_id", "operation", "committed_at",
            "total_rows", "total_bytes", "n_files", "n_delete_files", "tag")
      case "files" =>
        val s = pinned
        s.files.map(f => (s.id, f.path, f.rows, f.bytes, f.addedAt,
          f.stats.map { case (c, mn, mx) => c -> Seq(mn, mx) }.toMap))
          .toDF("snapshot_id", "path", "rows", "bytes", "added_at", "stats")
      case "deletes" =>
        val s = pinned
        s.deletes.map(d => (s.id, d.path, d.keyCol, d.rows, d.addedAt))
          .toDF("snapshot_id", "path", "key_col", "rows", "added_at")
      case "refs" =>
        tags(tableDir).toSeq.sorted.toDF("name", "snapshot_id")
      case "staged" =>
        // tolerate the list-then-read race: a staged commit published or
        // dropped between stagedIds() and the manifest read simply
        // vanishes from the listing instead of failing the whole describe
        stagedIds(tableDir).flatMap { sid =>
          try {
            val st = stagedManifest(tableDir, sid)
            Some((sid, st.operation, st.parentId,
              new java.sql.Timestamp(st.committedAtMs),
              st.files.map(_.rows).sum, st.files.size.toLong))
          } catch { case scala.util.control.NonFatal(_) => None }
        }.toDF("staging_id", "operation", "staged_on_snapshot", "staged_at",
          "total_rows", "n_files")
      case other => sys.error(
        s"unknown metadata table '$other' (snapshots|files|deletes|refs|staged)")
    }
  }

  /** Retain the newest `keepLast` snapshots; delete older manifests and
    * every commit DIRECTORY none of whose files is reachable from the
    * retained set — including `_SUCCESS`/`.crc` sidecars and the directory
    * itself, so a long-lived per-micro-batch ingest table doesn't grow an
    * unbounded pile of dead directories that retention GC never reclaims.
    *
    * A dead directory that was never referenced by ANY manifest is either
    * a crash orphan or a commit still IN FLIGHT (data written, manifest
    * not yet published — publishing is the commit point). The two are
    * indistinguishable by inspection, so never-referenced directories are
    * only deleted once older than `orphanMinAgeMs` (Iceberg's min-age
    * guard): a concurrent committer publishes within that window or has
    * genuinely died. Directories referenced by a now-expired manifest
    * were published long ago and are deleted regardless of age.
    *
    * Expired snapshots' hard-link view farms (`views/snap-<id>`,
    * [[readBucketed]]) are deleted with their manifests — they hold
    * links to the dead data files, so leaving them would keep the inodes
    * (the actual bytes) alive past retention.
    *
    * Returns (#manifests, #data files) removed. */
  def expireSnapshots(tableDir: String, keepLast: Int,
                      orphanMinAgeMs: Long = 3600000L): (Int, Int) =
    expireSnapshotsAttempt(tableDir, keepLast, orphanMinAgeMs, attempt = 1)

  /** [[expireSnapshots]] with the restart budget explicit: the two
    * world-re-read guards (tags, head/staged) restart the pass when the
    * table moved mid-computation, but a continuously ingesting table
    * could move EVERY pass — after `MaxGcAttempts` the pass completes
    * conservatively (tag guard: nothing done; data-sweep guard: manifests
    * expired, data sweep deferred to the next scheduled run) instead of
    * livelocking or growing the stack unboundedly. */
  private val MaxGcAttempts = 5
  private def expireSnapshotsAttempt(tableDir: String, keepLast: Int,
                                     orphanMinAgeMs: Long,
                                     attempt: Int): (Int, Int) = {
    require(keepLast >= 1, "must retain at least the current snapshot")
    val all = snapshots(tableDir)
    if (all.isEmpty) return (0, 0)
    // TAGGED snapshots are retained regardless of age — a published
    // release name must stay readable until someone explicitly dropTag's
    // it; everything it references (data, tombstones, view farms) is
    // thereby reachable state
    val tagIds = tags(tableDir).values.toSet
    val keepIds = all.takeRight(keepLast).map(_.id).toSet ++ tagIds
    val (retained, expired) = all.partition(s => keepIds(s.id))
    // tombstone files are reachable state like data files: a retained
    // snapshot's deletes must survive GC (reads re-apply them), an
    // expired-only tombstone dir (post-compaction) is swept like any
    // dead commit dir — d-* dirs live under data/ so one sweep covers both.
    // STAGED commits' files are reachable too: an audit in flight must not
    // lose its candidate (dropStaged releases them back to orphan sweep).
    // A staged manifest vanishing mid-listing (concurrent publish/drop) is
    // skipped: published files are in a retained manifest, dropped ones
    // fall to the age-gated orphan sweep.
    val stagedIds0 = stagedIds(tableDir)
    val stagedLive = stagedIds0.flatMap { sid =>
      try stagedManifest(tableDir, sid).files.map(_.path)
      catch { case scala.util.control.NonFatal(_) => Nil }
    }.toSet
    val live = retained.flatMap(s =>
      s.files.map(_.path) ++ s.deletes.map(_.path)).toSet ++ stagedLive
    val expiredRefs = expired.flatMap(s =>
      s.files.map(_.path) ++ s.deletes.map(_.path)).toSet -- live
    // last-moment ref re-read before anything destructive: a tag published
    // while this pass was computing must be honored — restart with the new
    // tag set (createTag's post-publish verify is the complementary guard
    // for a ref landing inside the remaining microsecond window)
    if (tags(tableDir).values.toSet != tagIds) {
      if (attempt >= MaxGcAttempts) return (0, 0) // defer; nothing destroyed
      return expireSnapshotsAttempt(tableDir, keepLast, orphanMinAgeMs, attempt + 1)
    }
    // hand a dying `wap:` tag's idempotency duty to a durable receipt: a
    // publishStaged that crashed between its publish and its receipt
    // write relies on this tag to detect the replay; expiring it without
    // a receipt — with a compaction free to erase path containment too —
    // would let the replay re-append the staged rows. The receipt is the
    // GC-proof word, written here exactly when the tag dies.
    expired.foreach { s =>
      s.tag.filter(_.startsWith("wap:")).foreach { t =>
        val sid = t.stripPrefix("wap:")
        val receipt = wapReceiptPath(tableDir, sid)
        // only the crash signature needs the hand-off: staged manifest
        // still present means a replay may come; absent means the publish
        // completed (receipt did its job and may have been swept already)
        if (!Files.exists(receipt) && Files.exists(stagedPath(tableDir, sid))) {
          val tmp = Files.createTempFile(metaDir(tableDir), ".wap-staging", ".txt")
          Files.write(tmp, s.id.toString.getBytes("UTF-8"))
          Files.move(tmp, receipt,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
      }
    }
    expired.foreach(s => Files.deleteIfExists(manifestPath(tableDir, s.id)))
    // a crash between staging and the atomic publish/move leaves a
    // dot-prefixed staging orphan in meta/ (.snap-staging*, .ref-staging*,
    // .feat-bound*, .source-*) that nothing else ever touches — sweep them
    // once safely older than any in-flight write (staging and publishing
    // happen within milliseconds; orphanMinAgeMs is hours), so a
    // long-lived table doesn't accumulate them unboundedly. All durable
    // meta/ files (snap-*.json, staged-*.json, ref-*.txt, source-*.txt,
    // feat-bound.txt) are un-dotted, so the dot prefix cleanly separates
    // staging state.
    locally {
      import scala.jdk.CollectionConverters._
      val now = System.currentTimeMillis()
      val listing = Files.list(metaDir(tableDir))
      try listing.iterator().asScala
        .filter(_.getFileName.toString.startsWith("."))
        .filter(p => now - Files.getLastModifiedTime(p).toMillis > orphanMinAgeMs)
        .foreach(Files.deleteIfExists(_))
      finally listing.close()
    }
    // expired view farms: their links pin the dead data files' inodes
    locally {
      import scala.jdk.CollectionConverters._
      val retainedIds = retained.map(_.id).toSet
      val viewsRoot = Paths.get(tableDir, "views")
      if (Files.isDirectory(viewsRoot)) {
        val dirs = { val l = Files.list(viewsRoot)
          try l.iterator().asScala.filter(Files.isDirectory(_)).toSeq
          finally l.close() }
        dirs.foreach { d =>
          val n = d.getFileName.toString
          val id = if (n.startsWith("snap-")) n.stripPrefix("snap-").toLongOption else None
          if (id.exists(i => !retainedIds.contains(i))) {
            val walk = Files.walk(d)
            try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
            finally walk.close()
          }
        }
      }
    }
    // WAP publish receipts (meta/wap-<sid>.txt) whose staged manifest is
    // gone have done their job; sweep them once aged so a long-lived
    // table doesn't accumulate one per historical publish. A receipt
    // whose staged manifest still EXISTS is kept regardless of age — the
    // replay seam it guards stays open until the manifest is consumed.
    locally {
      import scala.jdk.CollectionConverters._
      val now = System.currentTimeMillis()
      val listing = Files.list(metaDir(tableDir))
      try listing.iterator().asScala
        .filter { pth =>
          val n = pth.getFileName.toString
          n.startsWith("wap-") && n.endsWith(".txt") &&
            !Files.exists(stagedPath(tableDir,
              n.stripPrefix("wap-").stripSuffix(".txt"))) &&
            now - Files.getLastModifiedTime(pth).toMillis > orphanMinAgeMs
        }
        .foreach(Files.deleteIfExists(_))
      finally listing.close()
    }
    // last-moment WORLD re-read before anything the data sweep could
    // destroy (the staged twin of the tag guard above): a staged commit
    // PUBLISHED while this pass was computing puts its files in a
    // manifest NEWER than `all` — neither `live` nor `stagedLive` covers
    // them, so the sweep would delete files the new head references.
    // Restart with the current state; the manifest/view deletions above
    // are idempotent.
    if (currentSnapshotId(tableDir) != all.lastOption.map(_.id) ||
        stagedIds(tableDir) != stagedIds0) {
      // manifests already expired above (idempotent); defer only the
      // DATA sweep when the restart budget is exhausted — never sweep
      // with a stale live set
      if (attempt >= MaxGcAttempts) return (expired.size, 0)
      return expireSnapshotsAttempt(tableDir, keepLast, orphanMinAgeMs, attempt + 1)
    }
    val dataRoot = Paths.get(tableDir, "data")
    var removed = 0
    if (Files.isDirectory(dataRoot)) {
      import scala.jdk.CollectionConverters._
      val dirs = { val l = Files.list(dataRoot)
        try l.iterator().asScala.filter(Files.isDirectory(_)).toSeq
        finally l.close() }
      val now = System.currentTimeMillis()
      dirs.foreach { d =>
        val files = { val w = Files.walk(d)
          try w.iterator().asScala.filter(Files.isRegularFile(_)).toSeq
          finally w.close() }
        def rel(p: Path) = Paths.get(tableDir).relativize(p).toString.replace('\\', '/')
        val anyLive = files.exists(f => live(rel(f)))
        if (!anyLive) {
          val wasPublished = files.exists(f => expiredRefs(rel(f)))
          val newest = (Files.getLastModifiedTime(d).toMillis +:
            files.map(Files.getLastModifiedTime(_).toMillis)).max
          if (wasPublished || now - newest > orphanMinAgeMs) {
            removed += files.count(_.toString.endsWith(".parquet"))
            files.foreach(Files.deleteIfExists(_))
            Files.deleteIfExists(d)
          }
        }
      }
    }
    (expired.size, removed)
  }

  /** Plan a scan over an explicit file list. When the owning snapshot
    * recorded a schema, the read is METADATA-DRIVEN: the manifest schema
    * is imposed instead of inferred, which (a) skips footer sampling at
    * plan time — at 100 TB, schema inference over a million files is a
    * real cost — and (b) makes SCHEMA EVOLUTION work: files written
    * before a column was added simply read it as null (parquet's
    * missing-column semantics), exactly Iceberg's add-column behavior. */
  private def readFiles(spark: SparkSession, tableDir: String,
                        files: Seq[DataFile],
                        schemaJson: Option[String] = None): DataFrame = {
    require(files.nonEmpty, s"snapshot of $tableDir lists no data files")
    val reader = schemaJson.map(j => spark.read.schema(structFromJson(j)))
      .getOrElse(spark.read)
    reader.parquet(files.map(f => Paths.get(tableDir, f.path).toString): _*)
  }

  private def structFromJson(json: String): org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.DataType.fromJson(json)
      .asInstanceOf[org.apache.spark.sql.types.StructType]

  /** Part files of a freshly written parquet dir with footer row counts
    * and each requested column's min/max aggregated across row groups —
    * metadata-only, no Spark job. Stats are recorded only for integral
    * physical types (INT32/INT64 — longs, ints, and Spark timestamps,
    * whose physical value is epoch MICROseconds); other types or absent
    * footer statistics yield no entry for that column, which
    * [[readRange]] treats as "cannot skip" rather than guessing. */
  private def listParquet(spark: SparkSession, dir: Path, statsCols: Seq[String])
      : Seq[(String, Long, Long, Seq[(String, Long, Long)])] = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(dir.toString)
    val fs = p.getFileSystem(conf)
    fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
      .map { s =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(s, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        val (rows, st) =
          try (r.getRecordCount, statsCols.flatMap(footerMinMax(r.getFooter, _)))
          finally r.close()
        (s.getPath.getName, rows, s.getLen, st)
      }
  }

  /** True when `colName`'s parquet type makes its footer min/max safe to
    * interpret as the plain signed-long values [[readRange]] compares:
    * physical INT32/INT64 annotated as nothing, a signed integer, or a
    * TIMESTAMP in MICROS (Spark TimestampType's epoch-micros encoding,
    * which readRange's bounds use). Everything else — TIMESTAMP in
    * MILLIS/NANOS (`spark.sql.parquet.outputTimestampType=TIMESTAMP_MILLIS`
    * writes these), unsigned ints, decimals, dates, times — would be
    * silently misread in a different unit/scale, turning pruning into
    * WRONG RESULTS (in-range files skipped), so no stats are recorded and
    * such files are always read. */
  private def statsUnitSafe(footer: org.apache.parquet.hadoop.metadata.ParquetMetadata,
                            colName: String): Boolean = {
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.{INT32, INT64}
    import scala.jdk.CollectionConverters._
    footer.getFileMetaData.getSchema.getColumns.asScala
      .find(_.getPath.mkString(".") == colName)
      .exists { cd =>
        val pt = cd.getPrimitiveType
        (pt.getPrimitiveTypeName == INT32 || pt.getPrimitiveTypeName == INT64) &&
          (pt.getLogicalTypeAnnotation match {
            case null => true
            case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation => i.isSigned
            case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
              t.getUnit == LogicalTypeAnnotation.TimeUnit.MICROS
            case _ => false
          })
      }
  }

  /** (col, min, max) over all row groups of one file's footer, or None
    * when the column is missing, non-integral, of a unit-unsafe logical
    * type ([[statsUnitSafe]]), or lacks statistics. */
  private def footerMinMax(footer: org.apache.parquet.hadoop.metadata.ParquetMetadata,
                           colName: String): Option[(String, Long, Long)] = {
    import scala.jdk.CollectionConverters._
    if (!statsUnitSafe(footer, colName)) return None
    val perBlock = footer.getBlocks.asScala.toSeq.map { block =>
      block.getColumns.asScala
        .find(_.getPath.toDotString == colName)
        .flatMap { cc =>
          val stats = cc.getStatistics
          if (stats == null || stats.isEmpty || !stats.hasNonNullValue) None
          else (stats.genericGetMin, stats.genericGetMax) match {
            case (mn: java.lang.Long, mx: java.lang.Long) =>
              Some((mn.longValue, mx.longValue))
            case (mn: java.lang.Integer, mx: java.lang.Integer) =>
              Some((mn.longValue, mx.longValue))
            case _ => None
          }
        }
    }
    // every row group must carry stats, else the file bound is unknown
    if (perBlock.isEmpty || perBlock.exists(_.isEmpty)) None
    else {
      val bs = perBlock.flatten
      Some((colName, bs.map(_._1).min, bs.map(_._2).max))
    }
  }

  /** Range read with manifest-level FILE SKIPPING: plan over only the
    * snapshot files whose recorded `[min, max]` for `col` overlaps
    * `[lo, hi]` (files without stats for that column are kept — pruning
    * is an optimization, never a correctness bet), then apply the exact
    * row filter on top. With data written range-partitioned/sorted on
    * `col` (e.g. [[graft.streaming.SnapshotIngest]] of a time-ordered
    * stream: each commit's files span only that batch's ts window), a
    * narrow range touches a constant number of files regardless of table
    * size — the Iceberg min/max skipping that makes "last hour over
    * 10^12 rows" a small job, before parquet row-group pruning even runs.
    * For timestamp columns pass epoch microseconds and write with
    * `spark.sql.parquet.outputTimestampType=TIMESTAMP_MICROS` (Iceberg
    * mandates the same int64 encoding); Spark's legacy INT96 default
    * carries no footer statistics by parquet spec, and TIMESTAMP_MILLIS
    * stats are in the wrong unit — both are refused at commit time by
    * [[statsUnitSafe]], so such files are read, never skipped — pruning
    * degrades, correctness doesn't. */
  def readRange(spark: SparkSession, tableDir: String, col: String,
                lo: Long, hi: Long, snapshotId: Option[Long] = None): DataFrame =
    readRangeMulti(spark, tableDir, Seq((col, lo, hi)), snapshotId)

  /** [[readRange]] over SEVERAL columns at once: a file is skipped when
    * ANY requested column's recorded bounds are disjoint with its range —
    * independent pruning dimensions COMPOSE (Iceberg's multi-column
    * manifest bounds). Over an ingest clustered on (entity, time) —
    * e.g. `repartitionByRange(entityBucket, ts)` per commit with both
    * columns in `statsCols` — an entity-selective time-window read
    * touches only the files inside the intersection, files-touched
    * asserted in SnapshotTableSpec. Columns without recorded stats in a
    * given file never skip it; every requested range is still applied as
    * an exact row predicate. */
  def readRangeMulti(spark: SparkSession, tableDir: String,
                     ranges: Seq[(String, Long, Long)],
                     snapshotId: Option[Long] = None): DataFrame = {
    require(ranges.nonEmpty, "readRangeMulti needs at least one range")
    ranges.foreach { case (c, lo, hi) =>
      require(lo <= hi, s"empty range on $c: [$lo, $hi]") }
    val id = snapshotId.orElse(currentSnapshotId(tableDir)).getOrElse(
      sys.error(s"$tableDir has no snapshots"))
    val snap = snapshot(tableDir, id)
    val kept = prunedFiles(snap, ranges)
    import org.apache.spark.sql.functions.{col => c, lit, timestamp_micros}
    // every file skipped (or a zero-file snapshot): the correct result is
    // a typed empty frame; the predicates are still applied so a bad
    // column name fails identically on both paths. Kept files go through
    // the same tombstone application as read() — a range read must never
    // resurrect deleted rows (file skipping composes with the anti-join:
    // pruning shrinks the DATA side, the tombstones still apply whole).
    val df =
      if (kept.isEmpty) emptyWithSchema(spark, tableDir, snap)
      else readWithDeletes(spark, tableDir, kept, snap.deletes, snap.schemaJson)
    // exact filters in each column's own type so they reach PushedFilters
    // (a unix_micros()/cast wrapper would block parquet pushdown)
    ranges.foldLeft(df) { case (d, (colName, lo, hi)) =>
      val pred = d.schema(colName).dataType match {
        case org.apache.spark.sql.types.TimestampType =>
          c(colName).between(timestamp_micros(lit(lo)), timestamp_micros(lit(hi)))
        case _ => c(colName).between(lo, hi)
      }
      d.where(pred)
    }
  }

  /** The manifest-pruned file list for a set of ranges — the skipping
    * decision alone, exposed within the package so specs can assert
    * files-touched counts without reading data. */
  private[graft] def prunedFiles(snap: Snapshot,
                                 ranges: Seq[(String, Long, Long)]): Seq[DataFile] =
    snap.files.filter { f =>
      ranges.forall { case (colName, lo, hi) =>
        f.stats.find(_._1 == colName) match {
          case Some((_, mn, mx)) => mx >= lo && mn <= hi
          case None => true
        }
      }
    }

  // manifest JSON via json4s (on the Spark classpath; no new dependency)
  private def renderManifest(s: Snapshot): String = {
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods
    val json =
      ("snapshot_id" -> s.id) ~
        ("parent_id" -> s.parentId) ~
        ("operation" -> s.operation) ~
        ("committed_at_ms" -> s.committedAtMs) ~
        ("tag" -> s.tag) ~
        ("schema" -> s.schemaJson) ~
        ("total_rows" -> s.totalRows) ~
        ("bucket" -> s.bucketSpec.map { b =>
          ("buckets" -> b.buckets) ~ ("bucket_col" -> b.bucketCol) ~
            ("sort_cols" -> b.sortCols)
        }) ~
        ("files" -> s.files.map { f =>
          ("path" -> f.path) ~ ("rows" -> f.rows) ~ ("bytes" -> f.bytes) ~
            ("added_at" -> f.addedAt) ~
            ("stats" -> (f.stats match {
              case Nil => None
              case st => Some(st.map { case (c, mn, mx) =>
                ("col" -> c) ~ ("min" -> mn) ~ ("max" -> mx)
              })
            }))
        }) ~
        ("deletes" -> (s.deletes match {
          case Nil => None
          case ds => Some(ds.map { d =>
            ("path" -> d.path) ~ ("key_col" -> d.keyCol) ~
              ("rows" -> d.rows) ~ ("bytes" -> d.bytes) ~
              ("added_at" -> d.addedAt)
          })
        }))
    JsonMethods.pretty(JsonMethods.render(json))
  }

  private def parseManifest(text: String): Snapshot = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmts: Formats = DefaultFormats
    val j = JsonMethods.parse(text)
    Snapshot(
      (j \ "snapshot_id").extract[Long],
      (j \ "parent_id").extractOpt[Long],
      (j \ "operation").extract[String],
      (j \ "committed_at_ms").extract[Long],
      (j \ "files").extract[Seq[JValue]].map { f =>
        val multi = (f \ "stats") match {
          case JArray(entries) => entries.flatMap { e =>
            for {
              c <- (e \ "col").extractOpt[String]
              mn <- (e \ "min").extractOpt[Long]
              mx <- (e \ "max").extractOpt[Long]
            } yield (c, mn, mx)
          }
          case _ => Nil
        }
        // legacy single-column form (pre-multi-stats manifests): flat
        // stats_col/stats_min/stats_max fields on the file entry
        val legacy = for {
          c <- (f \ "stats_col").extractOpt[String]
          mn <- (f \ "stats_min").extractOpt[Long]
          mx <- (f \ "stats_max").extractOpt[Long]
        } yield (c, mn, mx)
        DataFile((f \ "path").extract[String], (f \ "rows").extract[Long],
          (f \ "bytes").extract[Long], if (multi.nonEmpty) multi else legacy.toSeq,
          (f \ "added_at").extractOpt[Long].getOrElse(0L))
      },
      (j \ "tag").extractOpt[String],
      (j \ "schema").extractOpt[String],
      (j \ "bucket") match {
        case JNothing | JNull => None
        case b => Some(BucketSpec(
          (b \ "buckets").extract[Int],
          (b \ "bucket_col").extract[String],
          (b \ "sort_cols").extract[Seq[String]]))
      },
      (j \ "deletes") match {
        case JArray(entries) => entries.map { d =>
          DeleteFile((d \ "path").extract[String],
            (d \ "key_col").extract[String],
            (d \ "rows").extract[Long],
            (d \ "bytes").extractOpt[Long].getOrElse(0L),
            (d \ "added_at").extract[Long])
        }
        case _ => Nil
      })
  }
}
