package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.ops.Dedup
import graft.sources.SnapshotTable

/** Incremental near-duplicate maintenance — the missing loop between a
  * continuously ingesting corpus and a dedup decision that stays current:
  * signatures for each ARRIVING batch are computed once, banded against
  * the persisted signature state, and only the new edges land — the
  * corpus payload is never re-hashed and state–state pairs are never
  * re-joined. At 100 TB this is the difference between a dedup pass that
  * costs O(batch) per ingest cycle and one that re-reads the corpus.
  *
  * State is two [[SnapshotTable]]s under `stateDir`:
  * {{{
  *   <stateDir>/signatures   (idCol, hashCol)   one row per corpus row
  *   <stateDir>/edges        (a, b, hamming)    the verified near-dup graph
  * }}}
  * Both are append-only, committed with idempotency tags keyed on the
  * processed corpus-snapshot window (`dedup-sig:<from>-<to>` /
  * `dedup-edges:<from>-<to>`), so [[processNew]]'s at-least-once delivery
  * (cursor advances after the job) composes to exactly-once state: a
  * crash anywhere between the edge commit, the signature commit, and the
  * cursor write replays into tag-detected no-ops. The edge commit lands
  * FIRST — a replay that finds `dedup-edges` but not `dedup-sig` simply
  * redoes the signature append; the reverse order could pair a batch
  * against state that already contains it.
  *
  * Cluster decisions ([[currentLabels]]) run connected components over
  * the ACCUMULATED edge table — the near-dup graph is pairs, orders of
  * magnitude smaller than the corpus, so recomputing the fixpoint per
  * cycle is the cheap part; all corpus-sized work (hash + band) is
  * strictly incremental. Correctness is oracled end-to-end by q119:
  * batch-incremental labels equal DuckDB's full-corpus transitive
  * closure on the same data.
  *
  * Reference semantics: musif's cache skips already-extracted files on a
  * re-run (`/root/reference/musif/extract/extract.py:559-575`); here the
  * "already extracted" membership is by snapshot commit and the derived
  * near-dup state is maintained transactionally beside the corpus.
  */
object IncrementalDedup {

  /** Banding/verify parameters — must stay FIXED for the lifetime of a
    * state dir: edges found under different `maxHamming`/`bandBits` don't
    * compose into one graph. The caller owns the config (one config per
    * state dir, the same way one consumer owns a cursor file). */
  final case class Config(
      idCol: String,
      hashCol: String,
      maxHamming: Int,
      cap: Int = 4096,
      broadcastSizes: Boolean = false,
      bandBits: Int = 16)

  def signaturesDir(stateDir: String): String = s"$stateDir/signatures"
  def edgesDir(stateDir: String): String = s"$stateDir/edges"

  /** Process every corpus commit since this consumer's cursor: compute
    * `signature` over ONLY the new rows, find the edges that touch them,
    * append both to the state tables, advance the cursor. Returns the
    * processed snapshot window, or None when nothing arrived.
    *
    * `signature` maps the raw batch to exactly `(cfg.idCol, cfg.hashCol)`
    * rows — e.g. `_.select($"img", ahash64($"bytes").as("ah"))`; keeping
    * it a caller-supplied projection means the state layer is hash-family
    * agnostic (aHash, MinHash band folds, SimHash — anything 64-bit).
    *
    * Corpus takedowns and upserts CASCADE AUTOMATICALLY: when the window
    * crosses a `delete` or `upsert` commit whose tombstone key column is
    * `cfg.idCol`, those keys are [[retract]]ed from the state BEFORE the
    * batch is processed — so a takedown needs no separate
    * `--retract-state` pass, and an upsert's re-signed rows (delivered by
    * the same window) land younger than the retraction and replace the
    * OLD content's signature instead of accumulating beside it (without
    * this, an updated row would keep its stale signature and ghost-edge
    * its former near-dups forever). Tombstones on a DIFFERENT key column
    * cannot be mapped to state ids and are skipped — cascade those with
    * an explicit [[retract]] (the `--retract-state` CLI path). */
  def processNew(spark: SparkSession, corpusDir: String, stateDir: String,
                 cursorPath: String, cfg: Config)
                (signature: DataFrame => DataFrame): Option[(Long, Long)] = {
    // cursor SELF-HEALING: if the state tables prove a newer corpus
    // snapshot was fully processed (sig commit landed) but the cursor
    // write crashed, fast-forward the cursor first. Without this, a
    // replay whose corpus head MOVED since the crash re-delivers the
    // already-signed batch under a different window — a tag the
    // idempotency check has never seen — and the signature table absorbs
    // it as duplicate rows (duplicate labels downstream).
    processedUpto(stateDir).filter(_ > Incremental.readCursor(cursorPath))
      .foreach(Incremental.writeCursor(cursorPath, _))
    Incremental.processNewWithRange(spark, corpusDir, cursorPath) {
      (fresh, from, to) =>
        // from == 0 is the bootstrap full read: tombstoned rows are
        // already absent and the state is this consumer's empty start
        val rk = if (from == 0L) None
                 else windowRetractionKeys(spark, corpusDir, cfg.idCol, from, to)
        processBatch(spark, stateDir,
          signature(fresh).select(col(cfg.idCol), col(cfg.hashCol)),
          from, to, cfg, rk)
    }
  }

  /** The ids a window's corpus commits tombstoned on `idCol` — the keys
    * whose derived state must die with them ([[processNew]]'s automatic
    * cascade). `delete` and `upsert` commits contribute their own
    * tombstones (`addedAt == commit id`); tombstones on other key columns
    * are skipped (no mapping to state ids exists — see [[processNew]]). */
  private[graft] def windowRetractionKeys(spark: SparkSession, corpusDir: String,
                                          idCol: String, fromExclusive: Long,
                                          toInclusive: Long): Option[DataFrame] = {
    val dels = (fromExclusive + 1 to toInclusive).flatMap { id =>
      val s = SnapshotTable.snapshot(corpusDir, id)
      if (s.operation == "delete" || s.operation == "upsert")
        s.deletes.filter(d => d.addedAt == s.id && d.keyCol == idCol)
      else Nil
    }
    if (dels.isEmpty) None
    else Some(spark.read.parquet(dels.map(d =>
        java.nio.file.Paths.get(corpusDir, d.path).toString): _*)
      .select(col(idCol)).distinct())
  }

  private def uptoFile(stateDir: String) =
    java.nio.file.Paths.get(stateDir, "processed-upto.txt")

  /** The newest corpus snapshot this state dir FULLY processed: max of
    * the durable `processed-upto.txt` mark and the newest `dedup-sig:`
    * tag's window end (the sig commit is a cycle's last state commit;
    * the newest-first tag walk stops at the first sig commit, so the
    * lookup is O(1) amortized — [[SnapshotTable.findByTagPrefix]]). The
    * two sources cover each other: the mark survives state-table
    * retention GC, the tag survives a crash before the mark's write. */
  private[graft] def processedUpto(stateDir: String): Option[Long] = {
    val fromTag = SnapshotTable
      .findByTagPrefix(signaturesDir(stateDir), "dedup-sig:")
      .flatMap(_.tag).map(_.stripPrefix("dedup-sig:").split("-")(1).toLong)
    (fromTag.toSeq ++ Incremental.readLongFile(uptoFile(stateDir)).toSeq)
      .maxOption
  }

  /** One batch's state transition, idempotent on `(from, to)` — package-
    * visible so the crash/replay seams (edge-committed-but-not-sig,
    * everything-committed-but-no-cursor) are directly unit-testable. */
  private[graft] def processBatch(spark: SparkSession, stateDir: String,
                                  freshSigs: DataFrame, from: Long, to: Long,
                                  cfg: Config,
                                  retractKeys: Option[DataFrame] = None): Unit = {
    val sigT = signaturesDir(stateDir)
    val edgeT = edgesDir(stateDir)
    val sigTag = s"dedup-sig:$from-$to"
    val edgeTag = s"dedup-edges:$from-$to"
    // replay detection via the NEWEST same-prefix tag only (early-stop
    // walk): a single consumer commits windows in order, so the newest
    // window end decides — a full-log findByTag miss would re-parse every
    // manifest on every fresh window, quadratic over the stream's lifetime
    def winEnd(s: SnapshotTable.Snapshot, prefix: String): Long =
      s.tag.get.stripPrefix(prefix).split("-")(1).toLong
    val newestSig = SnapshotTable.findByTagPrefix(sigT, "dedup-sig:")
    val newestEdge = SnapshotTable.findByTagPrefix(edgeT, "dedup-edges:")
    val sigDone = newestSig.filter(_.tag.contains(sigTag))
    val sigCovered = sigDone.isDefined ||
      newestSig.exists(winEnd(_, "dedup-sig:") >= to)
    val edgeDone = newestEdge.exists(_.tag.contains(edgeTag)) ||
      newestEdge.exists(winEnd(_, "dedup-edges:") >= to)
    if (sigCovered && edgeDone) return // full replay: nothing to do
    // the window's corpus retractions cascade FIRST: the batch must band
    // against the post-takedown state, and the window's re-signed rows
    // commit YOUNGER than these tombstones (so an upserted id's new
    // signature replaces the old instead of dying with it). Gated on
    // !edgeDone: once this window's edges landed, its retract necessarily
    // ran in the attempt that committed them — re-applying on a replay
    // would stamp tombstones YOUNGER than the committed re-signed rows
    // and erase them. The moved-head wider-window replay stays safe: its
    // re-applied tombstones kill the crashed attempt's retracted-id edges,
    // and the edgesAheadOfSigs anti-join below re-commits exactly those
    // pairs younger than the tombstone (verified in IncrementalDedupSpec).
    if (!edgeDone)
      retractKeys.foreach(keys => retract(spark, stateDir, cfg.idCol, keys))
    // state BEFORE this batch: on a partial replay whose signature append
    // already landed, time-travel to that commit's parent — otherwise the
    // batch would meet its own earlier append in the state side (harmless
    // for the edge SET — same-id pairs are excluded and distinct collapses
    // duplicates — but it doubles the candidate work for no reason)
    val state = sigDone match {
      case Some(snap) => snap.parentId match {
        case Some(pid) => SnapshotTable.read(spark, sigT, Some(pid))
        case None => freshSigs.limit(0)
      }
      case None => SnapshotTable.currentSnapshotId(sigT) match {
        case Some(head) => SnapshotTable.read(spark, sigT, Some(head))
        case None => freshSigs.limit(0)
      }
    }
    // the batch's signatures feed the edge join twice (fresh side + the
    // combined side) and then the signature commit — compute them once
    val fresh = freshSigs.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      if (!edgeDone) {
        val newEdges = Dedup.incrementalEdgesFromHashes(state, fresh,
          cfg.idCol, cfg.hashCol, cfg.maxHamming, cfg.cap,
          cfg.broadcastSizes, cfg.bandBits)
        // content-level idempotency for the one seam window arithmetic
        // can't close: edge commit landed, sig commit didn't, corpus head
        // moved — the replay's wider window re-generates the crashed
        // window's edges under a fresh tag. The crash signature is visible
        // in state (the newest edge window is AHEAD of the newest sig
        // window), so the dedup anti-join runs ONLY then — the normal path
        // stays O(batch), never scanning the accumulated edge table.
        val edgesAheadOfSigs = newestEdge.exists(winEnd(_, "dedup-edges:") >
          newestSig.map(winEnd(_, "dedup-sig:")).getOrElse(Long.MinValue))
        val edges =
          if (!edgesAheadOfSigs) newEdges
          else newEdges.join(
            SnapshotTable.read(spark, edgeT).select("a", "b"),
            Seq("a", "b"), "left_anti")
        SnapshotTable.commit(spark, edgeT, edges, "append", Some(edgeTag))
      }
      if (sigDone.isEmpty)
        SnapshotTable.commit(spark, sigT, fresh, "append", Some(sigTag))
      // durable completion mark OUTSIDE the expirable manifest log — the
      // cursor self-heal's GC-proof source (the SnapshotIngest pattern)
      Incremental.writeLongFile(uptoFile(stateDir), to)
    } finally fresh.unpersist(blocking = false)
  }

  /** Cascade a corpus takedown into the dedup state — the composition a
    * right-to-be-forgotten pass needs: removing rows from the corpus
    * ([[SnapshotTable.deleteKeys]]) must also remove their SIGNATURES
    * (or arriving batches keep banding against ghosts) and every edge
    * touching them (or [[currentLabels]] keeps clustering survivors with
    * rows that no longer exist — a survivor whose only duplicate was
    * retracted must become its own representative again, i.e. KEPT).
    *
    * Three equality-delete commits, each O(|ids|): the signature table on
    * `cfg.idCol`, the edge table on `a` and on `b` (an edge dies when
    * EITHER endpoint is retracted). No state rewrite — compact the state
    * tables on the usual maintenance schedule. A crash mid-retract
    * replays into extra no-op tombstones, and a later RE-INGEST of a
    * retracted id appends a fresh signature that the old tombstones
    * cannot touch, so it re-enters dedup cleanly.
    *
    * Concurrency: a dedup cycle IN FLIGHT while retract runs can commit
    * edges younger than the tombstones (it read the pre-retraction
    * state), and sequence semantics then keep those ghost edges alive in
    * the edge table. [[currentLabels]] is immune — it drops edges whose
    * endpoints lack live signatures at decision time — so labels stay
    * correct either way; still, schedule retract from the same
    * maintenance loop as `processNew` (the single-consumer convention
    * that already governs the cursor) rather than truly concurrently, or
    * a lingering ghost edge waits for a re-applied retract or a state
    * compaction to disappear from the raw table. */
  def retract(spark: SparkSession, stateDir: String, cfg: Config,
              ids: DataFrame): Unit =
    retract(spark, stateDir, cfg.idCol, ids)

  /** [[retract]] addressed by the id column alone — the banding config is
    * irrelevant to a takedown (tombstones don't hash anything), so the
    * CLI's `--retract-state` can cascade a `--delete-keys` takedown
    * without knowing the state dir's dedup parameters. */
  def retract(spark: SparkSession, stateDir: String, idCol: String,
              ids: DataFrame): Unit = {
    val keys = ids.select(col(idCol))
    val sigT = signaturesDir(stateDir)
    if (SnapshotTable.currentSnapshotId(sigT).nonEmpty)
      SnapshotTable.deleteKeys(spark, sigT, idCol, keys)
    val edgeT = edgesDir(stateDir)
    if (SnapshotTable.currentSnapshotId(edgeT).nonEmpty) {
      SnapshotTable.deleteKeys(spark, edgeT, "a", keys.select(col(idCol).as("a")))
      SnapshotTable.deleteKeys(spark, edgeT, "b", keys.select(col(idCol).as("b")))
    }
  }

  /** The dedup decision over everything processed so far: every id in the
    * signature state labeled with its cluster representative (min
    * reachable id over the accumulated near-dup graph) and a `kept` flag —
    * the q95 output contract, maintained incrementally. Rows in no edge
    * keep themselves. */
  def currentLabels(spark: SparkSession, stateDir: String,
                    cfg: Config): DataFrame = {
    val ids = SnapshotTable.read(spark, signaturesDir(stateDir))
      .select(col(cfg.idCol))
    // ghost-edge guard: only edges whose BOTH endpoints still have live
    // signatures participate in clustering — a retraction racing an
    // in-flight cycle can land edges younger than its tombstones (see
    // [[retract]]), and without this a legally-erased id would keep
    // labeling its surviving partner (or even BE its representative)
    val edges = SnapshotTable.read(spark, edgesDir(stateDir))
      .select(col("a"), col("b"))
      .join(ids.select(col(cfg.idCol).as("a")), Seq("a"), "left_semi")
      .join(ids.select(col(cfg.idCol).as("b")), Seq("b"), "left_semi")
    val cc = Dedup.connectedComponents(edges)
      .withColumnRenamed("id", cfg.idCol)
    ids.join(cc, Seq(cfg.idCol), "left")
      .select(col(cfg.idCol),
        coalesce(col("cluster_rep"), col(cfg.idCol)).as("rep"),
        (coalesce(col("cluster_rep"), col(cfg.idCol)) === col(cfg.idCol))
          .as("kept"))
  }

  /** Convenience: [[currentLabels]] joined back onto a corpus frame,
    * dropping every non-representative — the incremental face of
    * [[Dedup.dropClusteredDuplicates]]. */
  def keepRepresentatives(spark: SparkSession, stateDir: String, cfg: Config,
                          corpus: DataFrame): DataFrame = {
    val drop = currentLabels(spark, stateDir, cfg)
      .where(!col("kept")).select(col(cfg.idCol))
    corpus.join(drop, Seq(cfg.idCol), "left_anti")
  }
}
