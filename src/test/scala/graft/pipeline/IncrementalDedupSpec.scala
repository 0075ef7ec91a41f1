package graft.pipeline

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.Dedup
import graft.sources.SnapshotTable

/** The incremental-dedup state machine: batch-incremental results must
  * equal the full-corpus recompute (the q119 oracle's claim, unit-sized
  * here), and every crash/replay seam between the edge commit, the
  * signature commit, and the cursor write must land exactly-once. */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = IncrementalDedup.Config(
    "id", "h", maxHamming = 1, cap = 4096, broadcastSizes = true)

  /** 30 rows in 6 identical-hash quads (ids 0-23; the 6 quad patterns and
    * 6 singleton one-hots are pairwise hamming >= 2, so the TRUE clusters
    * are exactly the quads — verified ahead: no accidental cross-group
    * hamming <= 1 pair exists) + 6 singletons; batch split id%3 puts each
    * quad's members across ALL THREE batches, so cross-batch edges are
    * the common case, not the exception. */
  private def corpus: DataFrame = {
    val quadPatterns =
      Seq(0xFFL, 0xFF00L, 0xFFFFL, 0xFF0000L, 0xFF00FFL, 0xFFFF00L)
    spark.range(0, 30).toDF("id").withColumn("h",
      when(col("id") < 24,
        element_at(
          array(quadPatterns.map(lit): _*), (col("id") / 4).cast("int") + 1))
        .otherwise(expr("shiftleft(1L, cast(id - 24 AS INT) + 32)")))
  }

  private def fullEdges: DataFrame =
    Dedup.perceptualEdgesFromHashes(corpus, "id", "h", maxHamming = 1,
      cap = 4096, broadcastSizes = true)

  private def fullLabels: DataFrame = {
    val cc = Dedup.connectedComponents(fullEdges.select(col("a"), col("b")))
      .withColumnRenamed("id", "cid")
    val c = corpus
    c.join(cc, c("id") === col("cid"), "left")
      .select(c("id"),
        coalesce(col("cluster_rep"), col("id")).as("rep"),
        (coalesce(col("cluster_rep"), col("id")) === col("id")).as("kept"))
  }

  private def tmp(prefix: String): String =
    Files.createTempDirectory(s"graft-incdedup-$prefix").toString

  /** Ingest `corpus` as three commits, running one dedup cycle after each. */
  private def ingestAll(corpusDir: String, stateDir: String,
                        cursor: String): Unit =
    (0 to 2).foreach { g =>
      SnapshotTable.commit(spark, corpusDir,
        corpus.where(pmod(col("id"), lit(3)) === g))
      val r = IncrementalDedup.processNew(spark, corpusDir, stateDir,
        cursor, cfg)(identity)
      assert(r.isDefined, s"cycle $g saw no new commits")
    }

  test("incrementalEdgesFromHashes: union over batches == full edge set") {
    val batches = (0 to 2).map(g => corpus.where(pmod(col("id"), lit(3)) === g))
    var state = corpus.limit(0)
    var got = Seq.empty[DataFrame]
    batches.foreach { fresh =>
      got = got :+ Dedup.incrementalEdgesFromHashes(state, fresh, "id", "h",
        maxHamming = 1, cap = 4096, broadcastSizes = true)
      state = state.unionByName(fresh)
    }
    val union = got.reduce(_ unionByName _)
    assert(union.count() > 0, "edge set unexpectedly empty — vacuous test")
    assertSameRows(union, fullEdges)
    // and each batch's output only touches that batch (no state-state pairs):
    // batch 0 alone must NOT contain any edge between two id%3 != 0 rows
    val b0 = got.head
    assert(b0.where(pmod(col("a"), lit(3)) =!= 0 &&
      pmod(col("b"), lit(3)) =!= 0).isEmpty)
  }

  test("three ingest cycles converge to the full-corpus labels") {
    val (c, s) = (tmp("corpus"), tmp("state"))
    val cursor = s"$s/cursor.txt"
    ingestAll(c, s, cursor)
    val labels = IncrementalDedup.currentLabels(spark, s, cfg)
    assertSameRows(labels, fullLabels)
    // absolute spot checks so both sides being degenerate can't pass:
    // a quad clusters to its min id, a singleton keeps itself
    val row = labels.where(col("id") === 7).collect()(0)
    assert(row.getLong(1) === 4L && !row.getBoolean(2))
    assert(labels.where(col("kept")).count() === 12) // 6 quad reps + 6 singles
    // accumulated edge table == full recompute (no dup edges from replays)
    assertSameRows(
      SnapshotTable.read(spark, IncrementalDedup.edgesDir(s)), fullEdges)
    // keepRepresentatives drops exactly the 18 non-representatives
    val kept = IncrementalDedup.keepRepresentatives(spark, s, cfg, corpus)
    assert(kept.count() === 12)
  }

  test("replay of a fully committed batch is a no-op (crash before cursor)") {
    val (c, s) = (tmp("corpus"), tmp("state"))
    val cursor = s"$s/cursor.txt"
    ingestAll(c, s, cursor)
    val sigRows = SnapshotTable.read(spark,
      IncrementalDedup.signaturesDir(s)).count()
    val edgeHead = SnapshotTable.currentSnapshotId(IncrementalDedup.edgesDir(s))
    // the crash: cursor never advanced past cycle 2 — rewind and reprocess
    Files.write(java.nio.file.Paths.get(cursor), "2".getBytes("UTF-8"))
    val r = IncrementalDedup.processNew(spark, c, s, cursor, cfg)(identity)
    assert(r === None,
      "the self-healed cursor must detect the replay before re-reading the corpus")
    assert(Incremental.readCursor(cursor) === 3L, "cursor not fast-forwarded")
    // zero new rows, zero new snapshots
    assert(SnapshotTable.read(spark,
      IncrementalDedup.signaturesDir(s)).count() === sigRows)
    assert(SnapshotTable.currentSnapshotId(
      IncrementalDedup.edgesDir(s)) === edgeHead)
    assertSameRows(IncrementalDedup.currentLabels(spark, s, cfg), fullLabels)
    // the tag-level idempotency still holds when processBatch is replayed
    // DIRECTLY with a committed window (the pre-self-heal seam)
    IncrementalDedup.processBatch(spark, s,
      corpus.where(pmod(col("id"), lit(3)) === 2).select(col("id"), col("h")),
      2L, 3L, cfg)
    assert(SnapshotTable.read(spark,
      IncrementalDedup.signaturesDir(s)).count() === sigRows)
    assert(SnapshotTable.currentSnapshotId(
      IncrementalDedup.edgesDir(s)) === edgeHead)
  }

  test("ghost edges from a retract racing an in-flight cycle never affect labels") {
    val (c, s) = (tmp("corpus"), tmp("state"))
    val cursor = s"$s/cursor.txt"
    ingestAll(c, s, cursor)
    IncrementalDedup.retract(spark, s, cfg, Seq(0L).toDF("id"))
    // a cycle that read the PRE-retraction state lands its edge commit
    // after the tombstones — sequence semantics keep the ghost alive in
    // the raw edge table
    SnapshotTable.commit(spark, IncrementalDedup.edgesDir(s),
      Seq((0L, 3L, 0)).toDF("a", "b", "hamming"))
    assert(SnapshotTable.read(spark, IncrementalDedup.edgesDir(s))
      .where(col("a") === 0L).count() === 1, "precondition: ghost edge alive")
    // the decision layer drops it: the retracted id neither appears nor
    // captures its surviving partner's representative slot
    val labels = IncrementalDedup.currentLabels(spark, s, cfg)
    assert(labels.where(col("id") === 0L).isEmpty)
    assert(labels.where(col("id") === 3L).select("rep").as[Long].head() === 1L,
      "quad-0's survivors must cluster on their own min id, not the ghost")
  }

  test("corpus compaction between ingest cycles does not wedge or re-sign") {
    val (c, s) = (tmp("corpus"), tmp("state"))
    val cursor = s"$s/cursor.txt"
    (0 to 1).foreach { g =>
      SnapshotTable.commit(spark, c, corpus.where(pmod(col("id"), lit(3)) === g))
      IncrementalDedup.processNew(spark, c, s, cursor, cfg)(identity)
    }
    // scheduled maintenance rewrites the corpus while the dedup cursor
    // sits behind it; the next cycle's window crosses the replace commit
    // and must hash ONLY batch 3 — the compacted copies of batches 1-2
    // are existing data and must not re-enter the state
    assert(SnapshotTable.compact(spark, c).operation === "replace")
    SnapshotTable.commit(spark, c, corpus.where(pmod(col("id"), lit(3)) === 2))
    val r = IncrementalDedup.processNew(spark, c, s, cursor, cfg)(identity)
    assert(r === Some((2L, 4L)))
    val sigs = SnapshotTable.read(spark, IncrementalDedup.signaturesDir(s))
    assert(sigs.count() === 30)
    assert(sigs.groupBy("id").count().where(col("count") > 1).isEmpty,
      "compacted copies re-entered the signature state")
    assertSameRows(IncrementalDedup.currentLabels(spark, s, cfg), fullLabels)
  }

  test("moved-head replay: crash before the cursor write plus a NEW commit") {
    val (c, s) = (tmp("corpus"), tmp("state"))
    val cursor = s"$s/cursor.txt"
    ingestAll(c, s, cursor)
    // cycle 3 (window (2,3]) fully committed but died before the cursor
    // write — and the corpus moved on before the replay, so the replay's
    // window would be (2,4]: a tag the idempotency check has never seen.
    // Without cursor self-healing this re-appends batch 3's signatures.
    Files.write(java.nio.file.Paths.get(cursor), "2".getBytes("UTF-8"))
    val extra = Seq((30L, 0xF0F0F0F0L), (31L, 0xF0F0F0F0L)).toDF("id", "h")
    SnapshotTable.commit(spark, c, extra)
    val r = IncrementalDedup.processNew(spark, c, s, cursor, cfg)(identity)
    assert(r === Some((3L, 4L)), "heal must re-deliver ONLY the new commit")
    val sigs = SnapshotTable.read(spark, IncrementalDedup.signaturesDir(s))
    assert(sigs.count() === 32)
    assert(sigs.groupBy("id").count().where(col("count") > 1).isEmpty,
      "the moved-head replay duplicated signatures")
    val labels = IncrementalDedup.currentLabels(spark, s, cfg)
    assert(labels.count() === 32)
    val pair = labels.where(col("id").isin(30L, 31L)).collect()
      .map(x => x.getAs[Long]("id") -> x.getAs[Long]("rep")).toMap
    assert(pair(30L) === 30L && pair(31L) === 30L)
    assertSameRows(labels.where(col("id") < 30), fullLabels)
    val edges = SnapshotTable.read(spark, IncrementalDedup.edgesDir(s))
    assert(edges.groupBy("a", "b").count().where(col("count") > 1).isEmpty,
      "the moved-head replay duplicated edges")
  }

  test("moved-head replay after an edge-only crash: edges are not duplicated") {
    val (c, s) = (tmp("corpus"), tmp("state"))
    val cursor = s"$s/cursor.txt"
    (0 to 1).foreach { g =>
      SnapshotTable.commit(spark, c, corpus.where(pmod(col("id"), lit(3)) === g))
      IncrementalDedup.processNew(spark, c, s, cursor, cfg)(identity)
    }
    // cycle 3 crashes AFTER its edge commit, BEFORE the sig commit…
    SnapshotTable.commit(spark, c, corpus.where(pmod(col("id"), lit(3)) === 2))
    val fresh = corpus.where(pmod(col("id"), lit(3)) === 2)
    val state = SnapshotTable.read(spark, IncrementalDedup.signaturesDir(s))
    SnapshotTable.commit(spark, IncrementalDedup.edgesDir(s),
      Dedup.incrementalEdgesFromHashes(state, fresh, "id", "h", 1,
        cap = 4096, broadcastSizes = true),
      "append", Some("dedup-edges:2-3"))
    // …and the corpus moves on before the replay: the wider window (2,4]
    // re-generates batch 3's edges under a fresh tag — the content-level
    // anti-join must drop them
    val extra = Seq((30L, 0xF0F0F0F0L), (31L, 0xF0F0F0F0L)).toDF("id", "h")
    SnapshotTable.commit(spark, c, extra)
    val r = IncrementalDedup.processNew(spark, c, s, cursor, cfg)(identity)
    assert(r === Some((2L, 4L)), "batch 3 must be re-delivered (sigs never landed)")
    val edges = SnapshotTable.read(spark, IncrementalDedup.edgesDir(s))
    assert(edges.groupBy("a", "b").count().where(col("count") > 1).isEmpty,
      "the re-generated window duplicated edges")
    assertSameRows(edges.where(col("a") < 30 && col("b") < 30), fullEdges)
    val sigs = SnapshotTable.read(spark, IncrementalDedup.signaturesDir(s))
    assert(sigs.count() === 32)
    assertSameRows(
      IncrementalDedup.currentLabels(spark, s, cfg).where(col("id") < 30),
      fullLabels)
  }

  test("partial replay: edges committed, signatures not — completes cleanly") {
    val (c, s) = (tmp("corpus"), tmp("state"))
    val cursor = s"$s/cursor.txt"
    // cycles 1 and 2 complete normally
    (0 to 1).foreach { g =>
      SnapshotTable.commit(spark, c, corpus.where(pmod(col("id"), lit(3)) === g))
      IncrementalDedup.processNew(spark, c, s, cursor, cfg)(identity)
    }
    // cycle 3 "crashes" after the edge commit: land the edges under the
    // exact tag processBatch would use, leave signatures and cursor behind
    SnapshotTable.commit(spark, c, corpus.where(pmod(col("id"), lit(3)) === 2))
    val fresh = corpus.where(pmod(col("id"), lit(3)) === 2)
    val state = SnapshotTable.read(spark, IncrementalDedup.signaturesDir(s))
    SnapshotTable.commit(spark, IncrementalDedup.edgesDir(s),
      Dedup.incrementalEdgesFromHashes(state, fresh, "id", "h", 1,
        cap = 4096, broadcastSizes = true),
      "append", Some("dedup-edges:2-3"))
    val edgeHead = SnapshotTable.currentSnapshotId(IncrementalDedup.edgesDir(s))
    // the replay: must append ONLY the signatures, not re-append edges
    val r = IncrementalDedup.processNew(spark, c, s, cursor, cfg)(identity)
    assert(r === Some((2L, 3L)))
    assert(SnapshotTable.currentSnapshotId(
      IncrementalDedup.edgesDir(s)) === edgeHead, "edges were re-appended")
    assert(SnapshotTable.read(spark,
      IncrementalDedup.signaturesDir(s)).count() === 30)
    assertSameRows(IncrementalDedup.currentLabels(spark, s, cfg), fullLabels)
  }

  test("partial replay: signatures committed, edges too, cursor behind twice") {
    // two consecutive crashed replays of the same window must both no-op
    val (c, s) = (tmp("corpus"), tmp("state"))
    val cursor = s"$s/cursor.txt"
    ingestAll(c, s, cursor)
    (1 to 2).foreach { _ =>
      Files.write(java.nio.file.Paths.get(cursor), "2".getBytes("UTF-8"))
      IncrementalDedup.processNew(spark, c, s, cursor, cfg)(identity)
    }
    assert(SnapshotTable.read(spark,
      IncrementalDedup.signaturesDir(s)).count() === 30)
    assertSameRows(IncrementalDedup.currentLabels(spark, s, cfg), fullLabels)
  }

  test("retract: takedown cascades through signatures and edges; survivors re-keep") {
    val (c, s) = (tmp("corpus"), tmp("state"))
    val cursor = s"$s/cursor.txt"
    ingestAll(c, s, cursor)

    // retract 3 of quad-0's 4 members (ids 0,1,2) and singleton 24: the
    // quad's survivor (id 3) loses every partner and must flip to kept
    IncrementalDedup.retract(spark, s, cfg, Seq(0L, 1L, 2L, 24L).toDF("id"))
    val labels = IncrementalDedup.currentLabels(spark, s, cfg)
    assert(labels.count() === 26, "retracted ids must leave the state")
    assert(labels.where(col("id").isin(0L, 1L, 2L, 24L)).count() === 0)
    val id3 = labels.where(col("id") === 3L).collect()(0)
    assert(id3.getAs[Long]("rep") === 3L && id3.getAs[Boolean]("kept"),
      "a survivor whose partners were all retracted must keep itself")
    // untouched quads keep their full-corpus labels
    assertSameRows(labels.where(col("id") >= 4 && col("id") < 24),
      fullLabels.where(col("id") >= 4 && col("id") < 24))
    // no dangling edges: every remaining endpoint is a remaining id
    val edges = SnapshotTable.read(spark, IncrementalDedup.edgesDir(s))
    assert(edges.where(col("a").isin(0L, 1L, 2L) ||
      col("b").isin(0L, 1L, 2L)).count() === 0)

    // a replayed (crashed) retract is harmless: extra no-op tombstones
    IncrementalDedup.retract(spark, s, cfg, Seq(0L, 1L, 2L, 24L).toDF("id"))
    assertSameRows(IncrementalDedup.currentLabels(spark, s, cfg), labels)

    // RE-INGEST of a retracted id: the fresh signature is newer than the
    // tombstones, so it re-enters dedup and re-forms its quad-0 edges
    SnapshotTable.commit(spark, c, corpus.where(col("id") === 0L))
    IncrementalDedup.processNew(spark, c, s, cursor, cfg)(identity)
    val after = IncrementalDedup.currentLabels(spark, s, cfg)
    assert(after.count() === 27)
    val pair = after.where(col("id").isin(0L, 3L)).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("rep")).toMap
    assert(pair(0L) === 0L && pair(3L) === 0L,
      "the re-ingested id must re-cluster with its surviving partner")
  }

  test("mid-stream takedown: the next cycle crosses the delete commit (q123 unit)") {
    val (c, s) = (tmp("corpus"), tmp("state"))
    val cursor = s"$s/cursor.txt"
    def cycle(g: Int): Unit = {
      SnapshotTable.commit(spark, c, corpus.where(pmod(col("id"), lit(3)) === g))
      IncrementalDedup.processNew(spark, c, s, cursor, cfg)(identity)
    }
    cycle(0); cycle(1)
    // takedown of quad-0 members 0, 1 (already ingested) and 2 (NOT yet —
    // its batch arrives after the tombstone, so sequence semantics keep it
    // alive in the corpus AND it must still enter the dedup state)
    val takedown = Seq(0L, 1L, 2L).toDF("id")
    SnapshotTable.deleteKeys(spark, c, "id", takedown)
    IncrementalDedup.retract(spark, s, cfg, takedown)
    cycle(2) // window (2, 4] crosses the corpus delete commit — must not wedge
    val labels = IncrementalDedup.currentLabels(spark, s, cfg)
    assert(labels.count() === 28, "0 and 1 retracted; 2 arrived post-tombstone")
    assert(labels.where(col("id").isin(0L, 1L)).isEmpty)
    // the late arrival re-forms its quad edge with the surviving member 3
    val q0 = labels.where(col("id").isin(2L, 3L)).collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("rep"), r.getAs[Boolean]("kept")))).toMap
    assert(q0(2L) === ((2L, true)) && q0(3L) === ((2L, false)),
      s"quad-0 survivors mislabeled: $q0")
    // untouched quads and singletons keep their full-corpus labels
    assertSameRows(labels.where(col("id") >= 4),
      fullLabels.where(col("id") >= 4))
    // corpus membership and state membership agree after the cascade
    assertSameRows(SnapshotTable.read(spark, c).select("id"),
      labels.select("id"))
  }

  test("AUTO-cascade: a takedown crossing the window retracts state without a manual pass") {
    val (c, s) = (tmp("corpus"), tmp("state"))
    val cursor = s"$s/cursor.txt"
    def cycle(g: Int): Unit = {
      SnapshotTable.commit(spark, c, corpus.where(pmod(col("id"), lit(3)) === g))
      IncrementalDedup.processNew(spark, c, s, cursor, cfg)(identity)
    }
    cycle(0); cycle(1)
    // the q123 flow with NO IncrementalDedup.retract call: the corpus
    // delete commit inside the next window must cascade by itself
    SnapshotTable.deleteKeys(spark, c, "id", Seq(0L, 1L, 2L).toDF("id"))
    cycle(2)
    val labels = IncrementalDedup.currentLabels(spark, s, cfg)
    assert(labels.count() === 28, "0 and 1 auto-retracted; 2 arrived post-tombstone")
    assert(labels.where(col("id").isin(0L, 1L)).isEmpty)
    val q0 = labels.where(col("id").isin(2L, 3L)).collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("rep"), r.getAs[Boolean]("kept")))).toMap
    assert(q0(2L) === ((2L, true)) && q0(3L) === ((2L, false)))
    assertSameRows(labels.where(col("id") >= 4), fullLabels.where(col("id") >= 4))
    assertSameRows(SnapshotTable.read(spark, c).select("id"), labels.select("id"))
  }

  test("AUTO-cascade: a corpus UPSERT replaces the old content's signature and edges") {
    val (c, s) = (tmp("corpus"), tmp("state"))
    val cursor = s"$s/cursor.txt"
    ingestAll(c, s, cursor)
    // id 3 (quad-0 member) gets NEW content equal to quad-1's pattern:
    // its old signature and its quad-0 edges must die with the upsert,
    // and the re-signed row must join quad-1 instead
    SnapshotTable.upsert(spark, c, "id",
      Seq((3L, 0xFF00L)).toDF("id", "h"))
    val r = IncrementalDedup.processNew(spark, c, s, cursor, cfg)(identity)
    assert(r.isDefined)
    val sigs = SnapshotTable.read(spark, IncrementalDedup.signaturesDir(s))
    assert(sigs.where(col("id") === 3L).count() === 1,
      "the upserted id must have exactly ONE live signature (the new one)")
    assert(sigs.where(col("id") === 3L).select("h").as[Long].head() === 0xFF00L)
    val labels = IncrementalDedup.currentLabels(spark, s, cfg)
    assert(labels.count() === 30)
    val moved = labels.where(col("id").isin(0L, 3L, 4L)).collect()
      .map(x => x.getAs[Long]("id") -> x.getAs[Long]("rep")).toMap
    assert(moved(0L) === 0L, "quad-0 keeps its remaining members")
    assert(moved(3L) === 3L && moved(4L) === 3L,
      s"the re-signed id must cluster with its NEW content's quad: $moved")
    assert(SnapshotTable.read(spark, IncrementalDedup.edgesDir(s))
      .where((col("a") === 3L && col("b") < 4L) ||
        (col("b") === 3L && col("a") < 4L)).isEmpty,
      "stale quad-0 edges of the upserted id must be dead")
  }

  test("AUTO-cascade: tombstones on a different key column are skipped, not cascaded") {
    val (c, s) = (tmp("corpus"), tmp("state"))
    val cursor = s"$s/cursor.txt"
    def cycle(g: Int): Unit = {
      SnapshotTable.commit(spark, c, corpus.where(pmod(col("id"), lit(3)) === g))
      IncrementalDedup.processNew(spark, c, s, cursor, cfg)(identity)
    }
    cycle(0); cycle(1)
    // a corpus takedown keyed on the HASH column: no mapping to state ids
    // exists, so the cascade must skip it (manual retract is the
    // documented path) — and the cycle must not wedge
    SnapshotTable.deleteKeys(spark, c, "h", Seq(0xFFL).toDF("h"))
    cycle(2)
    assert(SnapshotTable.read(spark,
      IncrementalDedup.signaturesDir(s)).count() === 30,
      "a different-column takedown must not touch the state")
    assert(IncrementalDedup.windowRetractionKeys(spark, c, "id", 2L, 4L) === None)
  }

  test("replayed window with retraction keys: the edge-done guard keeps re-signed rows") {
    val (c, s) = (tmp("corpus"), tmp("state"))
    val cursor = s"$s/cursor.txt"
    (0 to 1).foreach { g =>
      SnapshotTable.commit(spark, c, corpus.where(pmod(col("id"), lit(3)) === g))
      IncrementalDedup.processNew(spark, c, s, cursor, cfg)(identity)
    }
    val takedown = Seq(0L, 1L, 2L).toDF("id")
    SnapshotTable.deleteKeys(spark, c, "id", takedown)      // corpus 3
    SnapshotTable.commit(spark, c,
      corpus.where(pmod(col("id"), lit(3)) === 2))          // corpus 4
    // the crashed attempt: retract ran, the window's edges landed (id 2
    // arrived post-tombstone and re-formed its quad edge), sigs + cursor
    // didn't make it
    IncrementalDedup.retract(spark, s, cfg, takedown)
    val state = SnapshotTable.read(spark, IncrementalDedup.signaturesDir(s))
    val fresh = SnapshotTable.changes(spark, c, 2L, 4L)
    SnapshotTable.commit(spark, IncrementalDedup.edgesDir(s),
      Dedup.incrementalEdgesFromHashes(state, fresh, "id", "h", 1,
        cap = 4096, broadcastSizes = true),
      "append", Some("dedup-edges:2-4"))
    // the replay: edgeDone holds, so the retraction must NOT re-apply —
    // a re-applied tombstone (younger than the committed edges) would
    // erase the post-takedown arrival's edges
    val r = IncrementalDedup.processNew(spark, c, s, cursor, cfg)(identity)
    assert(r === Some((2L, 4L)))
    val labels = IncrementalDedup.currentLabels(spark, s, cfg)
    assert(labels.count() === 28)
    val q0 = labels.where(col("id").isin(2L, 3L)).collect()
      .map(x => x.getAs[Long]("id") -> x.getAs[Long]("rep")).toMap
    assert(q0 === Map(2L -> 2L, 3L -> 2L),
      s"the replay erased the re-signed row's edges: $q0")
    assert(SnapshotTable.read(spark, IncrementalDedup.edgesDir(s))
      .where(col("a") === 2L || col("b") === 2L).count() > 0)
  }

  test("append-then-delete inside one window: the row is never delivered") {
    val (c, s) = (tmp("corpus"), tmp("state"))
    val cursor = s"$s/cursor.txt"
    SnapshotTable.commit(spark, c, corpus.where(pmod(col("id"), lit(3)) === 0))
    IncrementalDedup.processNew(spark, c, s, cursor, cfg)(identity)
    // batch 1 lands, then id 4 is taken down BEFORE the consumer runs: the
    // window's own tombstone (younger than the window's append) applies,
    // so the row must not reach the job at all
    SnapshotTable.commit(spark, c, corpus.where(pmod(col("id"), lit(3)) === 1))
    SnapshotTable.deleteKeys(spark, c, "id", Seq(4L).toDF("id"))
    IncrementalDedup.retract(spark, s, cfg, Seq(4L).toDF("id")) // no-op tombstones
    val r = IncrementalDedup.processNew(spark, c, s, cursor, cfg)(identity)
    assert(r === Some((1L, 3L)))
    val sigs = SnapshotTable.read(spark, IncrementalDedup.signaturesDir(s))
    assert(sigs.where(col("id") === 4L).isEmpty,
      "a row deleted within its own delivery window was signed")
  }
}
