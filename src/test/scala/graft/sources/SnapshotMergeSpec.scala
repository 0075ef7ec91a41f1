package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** The round-5 session-3 snapshot primitives: atomic upsert (MERGE),
  * CDC changelog with pre-images, write-audit-publish staging, and
  * rollback. [[SnapshotTableSpec]] covers the base commit/delete/compact
  * machinery these compose with. */
class SnapshotMergeSpec extends SparkSpec {

  private def rows(from: Long, until: Long) =
    spark.range(from, until)
      .withColumn("entity", pmod(col("id"), lit(8)))
      .withColumn("v", col("id").cast("double"))

  private def tmpTable(): String =
    Files.createTempDirectory("graft-merge").toString

  // ---------------------------------------------------------------- upsert

  test("upsert is ONE commit: matched keys replaced, unmatched inserted") {
    val dir = tmpTable()
    SnapshotTable.append(spark, dir, rows(0, 100))
    // batch overlaps [50,100) (matched -> replaced) and adds [100,120)
    val batch = rows(50, 120).withColumn("v", col("v") + 10000)
    val s2 = SnapshotTable.upsert(spark, dir, "id", batch)
    assert(s2.id === 2L && s2.operation === "upsert")
    assert(s2.deletes.exists(_.addedAt === 2L), "tombstone rides the same commit")
    assert(SnapshotTable.snapshotIds(dir) === Seq(1L, 2L),
      "no intermediate delete-only snapshot")
    val expected = rows(0, 50).unionByName(batch)
    assertSameRows(SnapshotTable.read(spark, dir), expected)
    // time travel: the pre-upsert version is untouched
    assertSameRows(SnapshotTable.read(spark, dir, Some(1L)), rows(0, 100))
  }

  test("repeated upserts: newest version wins; a key's rows are replaced as a set") {
    val dir = tmpTable()
    // two rows per key (multi-line orders): upsert replaces BOTH
    val base = rows(0, 10).unionByName(rows(0, 10).withColumn("v", col("v") + 0.5))
    SnapshotTable.append(spark, dir, base)
    val up1 = rows(3, 6).withColumn("v", col("v") + 100)
    SnapshotTable.upsert(spark, dir, "id", up1)
    val up2 = rows(5, 8).withColumn("v", col("v") + 200)
    SnapshotTable.upsert(spark, dir, "id", up2)
    val expected = base.where(col("id") < 3 || col("id") >= 8)
      .unionByName(up1.where(col("id") < 5)).unionByName(up2)
    assertSameRows(SnapshotTable.read(spark, dir), expected)
  }

  test("upsert batch must carry the key column") {
    val dir = tmpTable()
    SnapshotTable.append(spark, dir, rows(0, 10))
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.upsert(spark, dir, "missing_col", rows(0, 5))
    }
    assert(e.getMessage.contains("missing_col"))
  }

  test("upsert refuses a key column absent from the HEAD schema") {
    // older files would read the key as null, the anti-join would match
    // nothing, and every old version would silently survive — refuse loudly
    val dir = tmpTable()
    SnapshotTable.append(spark, dir, rows(0, 10))
    val batch = rows(0, 5).withColumn("extra_key", col("id"))
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.upsert(spark, dir, "extra_key", batch)
    }
    assert(e.getMessage.contains("extra_key"))
    assert(SnapshotTable.currentSnapshotId(dir) === Some(1L), "nothing published")
  }

  test("an empty upsert batch is an idle commit, not a crash") {
    val dir = tmpTable()
    SnapshotTable.append(spark, dir, rows(0, 10))
    val s2 = SnapshotTable.upsert(spark, dir, "id", rows(0, 10).where(lit(false)))
    assert(s2.operation === "upsert")
    assertSameRows(SnapshotTable.read(spark, dir), rows(0, 10))
  }

  test("upsert/delete refuse a key column schema evolution left null in older files") {
    val dir = tmpTable()
    SnapshotTable.append(spark, dir, rows(0, 10)) // (id, entity, v)
    SnapshotTable.append(spark, dir,
      rows(10, 20).withColumn("k", col("id") * 10)) // evolution adds k
    // the head schema HAS k, but commit-1's files don't: their rows would
    // read k as null and silently survive the anti-join — refuse loudly
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.upsert(spark, dir, "k",
        rows(0, 5).withColumn("k", col("id") * 10))
    }
    assert(e.getMessage.contains("schema evolution"))
    val e2 = intercept[IllegalArgumentException] {
      SnapshotTable.deleteKeys(spark, dir, "k",
        rows(0, 1).select((col("id") + 100).as("k")))
    }
    assert(e2.getMessage.contains("schema evolution"))
    // the documented remedy: compact materializes the column everywhere
    SnapshotTable.compact(spark, dir)
    SnapshotTable.deleteKeys(spark, dir, "k",
      rows(10, 11).select((col("id") * 10).as("k"))) // k=100 -> id 10
    assert(SnapshotTable.read(spark, dir).where(col("id") === 10).isEmpty)
    assert(SnapshotTable.read(spark, dir).count() === 19L)
  }

  test("the key check covers every file of a legacy (addedAt 0) manifest group") {
    val dir = tmpTable()
    SnapshotTable.append(spark, dir, rows(0, 10)) // files lack k
    SnapshotTable.append(spark, dir,
      rows(10, 20).withColumn("k", col("id"))) // files carry k
    val head = SnapshotTable.snapshot(dir, 2L)
    // simulate a pre-upgrade manifest: every file parses with addedAt 0,
    // so MIXED-schema commits share one group — a single-footer shortcut
    // could sample the k-bearing commit and let the delete through
    val legacy = head.copy(id = 3L, parentId = Some(2L),
      files = head.files.map(_.copy(addedAt = 0L)))
    assert(SnapshotTable.publish(dir, legacy))
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.deleteKeys(spark, dir, "k",
        rows(0, 1).select(col("id").as("k")))
    }
    assert(e.getMessage.contains("schema evolution"))
  }

  test("a dying wap tag hands its idempotency duty to a receipt (crash before receipt write)") {
    val dir = tmpTable()
    SnapshotTable.append(spark, dir, rows(0, 50))
    val sid = SnapshotTable.stageCommit(spark, dir, rows(50, 70))
    val stagedFile = Paths.get(dir, "meta", s"staged-$sid.json")
    val backup = Files.createTempFile("staged-hand", ".json")
    Files.copy(stagedFile, backup, StandardCopyOption.REPLACE_EXISTING)
    SnapshotTable.publishStaged(dir, sid)
    // reconstruct the crash-between-publish-and-receipt state: staged
    // manifest present, receipt ABSENT, only the wap tag carries the word
    Files.copy(backup, stagedFile)
    Files.deleteIfExists(Paths.get(dir, "meta", s"wap-$sid.txt"))
    // compaction erases path containment, then GC expires the wap tag —
    // it must write the receipt as it does (the hand-off), or the replay
    // below would re-append
    SnapshotTable.compact(spark, dir)
    SnapshotTable.expireSnapshots(dir, keepLast = 1)
    assert(SnapshotTable.findByTag(dir, s"wap:$sid") === None)
    assert(Files.exists(Paths.get(dir, "meta", s"wap-$sid.txt")),
      "GC must hand the dying wap tag to a durable receipt")
    SnapshotTable.publishStaged(dir, sid)
    assert(SnapshotTable.read(spark, dir).count() === 70L,
      "the replay double-appended after the tag died")
  }

  test("rollback and clustered rewrites refuse non-sensical inputs loudly") {
    val dir = tmpTable()
    SnapshotTable.append(spark, dir,
      rows(0, 50).withColumn("label", concat(lit("x"), col("id"))))
    // a string Z-order dimension would silently produce an unclustered
    // rewrite via the all-null cast — refused instead
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.compactZOrdered(spark, dir, "label", "id", 4)
    }
    assert(e.getMessage.contains("numeric or timestamp"))
  }

  test("publishStaged replay survives compaction + GC via the durable receipt") {
    val dir = tmpTable()
    SnapshotTable.append(spark, dir, rows(0, 50))
    val sid = SnapshotTable.stageCommit(spark, dir, rows(50, 70))
    val stagedFile = Paths.get(dir, "meta", s"staged-$sid.json")
    val backup = Files.createTempFile("staged-cmp", ".json")
    Files.copy(stagedFile, backup, StandardCopyOption.REPLACE_EXISTING)
    SnapshotTable.publishStaged(dir, sid)
    // compaction rewrites EVERY path (defeating path containment) and
    // retention expires the wap-tagged snapshot (defeating the tag) —
    // only the durable receipt can tell the replay the publish landed
    SnapshotTable.compact(spark, dir)
    SnapshotTable.expireSnapshots(dir, keepLast = 1)
    assert(SnapshotTable.findByTag(dir, s"wap:$sid") === None,
      "precondition: wap tag expired")
    Files.copy(backup, stagedFile)
    SnapshotTable.publishStaged(dir, sid)
    assert(SnapshotTable.read(spark, dir).count() === 70L,
      "the replay double-appended through a rewritten lineage")
    assert(SnapshotTable.stagedIds(dir).isEmpty)
  }

  test("publishStaged replay survives retention GC of the published snapshot") {
    val dir = tmpTable()
    SnapshotTable.append(spark, dir, rows(0, 50))
    val sid = SnapshotTable.stageCommit(spark, dir, rows(50, 70))
    val stagedFile = Paths.get(dir, "meta", s"staged-$sid.json")
    val backup = Files.createTempFile("staged-gc", ".json")
    Files.copy(stagedFile, backup, StandardCopyOption.REPLACE_EXISTING)
    SnapshotTable.publishStaged(dir, sid)
    // commits land and retention expires the wap-tagged snapshot (a commit
    // tag is not a ref — it does not pin against GC)
    SnapshotTable.append(spark, dir, rows(70, 80))
    SnapshotTable.append(spark, dir, rows(80, 90))
    SnapshotTable.expireSnapshots(dir, keepLast = 2, orphanMinAgeMs = 0L)
    assert(SnapshotTable.findByTag(dir, s"wap:$sid") === None,
      "precondition: the wap-tagged snapshot must be expired")
    // the crashed publisher's replay: the staged manifest survived the
    // crash — the path-containment guard must detect the landed files
    // instead of appending them a second time
    Files.copy(backup, stagedFile)
    SnapshotTable.publishStaged(dir, sid)
    assert(SnapshotTable.read(spark, dir).count() === 90L,
      "the replay double-appended the staged rows")
    assert(SnapshotTable.stagedIds(dir).isEmpty)
  }

  test("upsert preserves a bucketed head's layout; compact restores the zero-exchange read") {
    val dir = tmpTable()
    val spec = SnapshotTable.BucketSpec(4, "entity", Seq("id"))
    SnapshotTable.commitBucketed(spark, dir, rows(0, 100), spec)
    val s2 = SnapshotTable.upsert(spark, dir, "id",
      rows(90, 110).withColumn("v", col("v") + 1000))
    assert(s2.bucketSpec === Some(spec), "upsert keeps the layout")
    // mixed-age files + tombstones: the bucketed view cannot express the
    // split plan -> refused with the compact remedy; read() stays exact
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.readBucketed(spark, dir)
    }
    assert(e.getMessage.contains("compact"))
    val expected = rows(0, 90)
      .unionByName(rows(90, 110).withColumn("v", col("v") + 1000))
    assertSameRows(SnapshotTable.read(spark, dir), expected)
    val s3 = SnapshotTable.compact(spark, dir)
    assert(s3.bucketSpec === Some(spec) && s3.deletes.isEmpty)
    assertSameRows(SnapshotTable.readBucketed(spark, dir), expected)
  }

  test("changes() traverses an upsert: batch delivered, window appends deduped") {
    val dir = tmpTable()
    SnapshotTable.append(spark, dir, rows(0, 50))        // 1 (pre-window)
    SnapshotTable.append(spark, dir, rows(50, 80))       // 2 (window append)
    val batch = rows(70, 90).withColumn("v", col("v") + 1000)
    SnapshotTable.upsert(spark, dir, "id", batch)        // 3 (window upsert)
    // window (1,3]: commit 2's rows in their POST-upsert form + the batch;
    // pre-window rows never re-reported (append-scan semantics)
    val expected = rows(50, 70).unionByName(batch)
    assertSameRows(SnapshotTable.changes(spark, dir, 1L, 3L), expected)
  }

  // ------------------------------------------------------------- changelog

  private def applyChangelog(start: DataFrame, cl: DataFrame): DataFrame = {
    val cols = start.columns.toSeq
    def strip(df: DataFrame) = df.select(cols.map(col): _*)
    start
      .unionByName(strip(cl.where(col("_change_type") === "insert")))
      .exceptAll(strip(cl.where(col("_change_type") === "delete")))
  }

  test("changelog: upsert decomposes into pre-image deletes + inserts; apply-invariant holds") {
    val dir = tmpTable()
    SnapshotTable.append(spark, dir, rows(0, 100))       // 1
    val batch = rows(50, 120).withColumn("v", col("v") + 10000)
    SnapshotTable.upsert(spark, dir, "id", batch)        // 2
    val cl = SnapshotTable.changelog(spark, dir, 1L, 2L)
    assert(cl.columns.contains("_change_type") && cl.columns.contains("_commit_id"))
    // deletes = PRE-images of the matched keys (original v), not post-images
    assertSameRows(
      cl.where(col("_change_type") === "delete")
        .select("id", "entity", "v"),
      rows(50, 100))
    assertSameRows(
      cl.where(col("_change_type") === "insert")
        .select("id", "entity", "v"),
      batch)
    assert(cl.select("_commit_id").distinct().collect().map(_.getLong(0)).toSeq === Seq(2L))
    // the invariant: state(1) - deletes + inserts == state(2), as multisets
    assertSameRows(
      applyChangelog(SnapshotTable.read(spark, dir, Some(1L)), cl),
      SnapshotTable.read(spark, dir, Some(2L)))
  }

  test("changelog: history is reported, not surviving state — a later delete re-emits") {
    val dir = tmpTable()
    SnapshotTable.append(spark, dir, rows(0, 20))                    // 1
    SnapshotTable.append(spark, dir, rows(20, 30))                   // 2
    SnapshotTable.deleteKeys(spark, dir, "id",
      rows(25, 35).select("id"))                                     // 3
    val cl = SnapshotTable.changelog(spark, dir, 1L, 3L)
    // commit 2's rows appear as inserts even though [25,30) die at commit 3
    assertSameRows(
      cl.where(col("_change_type") === "insert").select("id", "entity", "v"),
      rows(20, 30))
    // commit 3's deletes are the pre-images LIVE at its parent ([25,30));
    // absent keys [30,35) emit nothing
    assertSameRows(
      cl.where(col("_change_type") === "delete").select("id", "entity", "v"),
      rows(25, 30))
    assertSameRows(
      applyChangelog(SnapshotTable.read(spark, dir, Some(1L)), cl),
      SnapshotTable.read(spark, dir, Some(3L)))
  }

  test("changelog: already-dead rows emit no second delete; compaction emits nothing") {
    val dir = tmpTable()
    SnapshotTable.append(spark, dir, rows(0, 30))                    // 1
    SnapshotTable.deleteKeys(spark, dir, "id", rows(0, 10).select("id")) // 2
    SnapshotTable.deleteKeys(spark, dir, "id", rows(5, 15).select("id")) // 3
    SnapshotTable.compact(spark, dir)                                // 4 (replace)
    val cl = SnapshotTable.changelog(spark, dir, 1L, 4L)
    // [5,10) died at commit 2 — commit 3 must not re-emit them
    assertSameRows(
      cl.where(col("_change_type") === "delete" && col("_commit_id") === 3)
        .select("id", "entity", "v"),
      rows(10, 15))
    assert(cl.where(col("_commit_id") === 4).count() === 0L,
      "a replace changes files, not rows")
    assertSameRows(
      applyChangelog(SnapshotTable.read(spark, dir, Some(1L)), cl),
      SnapshotTable.read(spark, dir, Some(4L)))
  }

  test("changelog: refuses overwrite and rollback boundaries; empty window is typed") {
    val dir = tmpTable()
    SnapshotTable.append(spark, dir, rows(0, 10))   // 1
    SnapshotTable.append(spark, dir, rows(10, 20))  // 2
    SnapshotTable.overwrite(spark, dir, rows(0, 5)) // 3
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.changelog(spark, dir, 1L, 3L)
    }
    assert(e.getMessage.contains("overwrite"))
    SnapshotTable.rollbackTo(dir, 2L)               // 4
    val e2 = intercept[IllegalArgumentException] {
      SnapshotTable.changelog(spark, dir, 3L, 4L)
    }
    assert(e2.getMessage.contains("rollback"))
    // a window of idle/replace-only commits yields a typed empty frame
    SnapshotTable.compact(spark, dir)               // 5
    val empty = SnapshotTable.changelog(spark, dir, 4L, 5L)
    assert(empty.count() === 0L)
    assert(empty.columns.toSeq ===
      Seq("id", "entity", "v", "_change_type", "_commit_id"))
  }

  // ----------------------------------------------------- write-audit-publish

  test("WAP: staging is invisible to head readers; audit sees the candidate; publish lands it") {
    val dir = tmpTable()
    SnapshotTable.append(spark, dir, rows(0, 100))
    // head tombstones compose into the audit read: deleted keys stay dead,
    // staged rows (newest) survive even when they re-use deleted keys
    SnapshotTable.deleteKeys(spark, dir, "id", rows(0, 10).select("id"))
    val staged = rows(0, 5).unionByName(rows(100, 120))
    val sid = SnapshotTable.stageCommit(spark, dir, staged)
    assert(SnapshotTable.currentSnapshotId(dir) === Some(2L), "head unmoved")
    assert(SnapshotTable.read(spark, dir).count() === 90L, "readers unaffected")
    assertSameRows(SnapshotTable.readStaged(spark, dir, sid),
      rows(10, 100).unionByName(staged))
    assert(SnapshotTable.stagedIds(dir) === Seq(sid))
    val snap = SnapshotTable.publishStaged(dir, sid)
    assert(snap.id === 3L && snap.tag === Some(s"wap:$sid"))
    assertSameRows(SnapshotTable.read(spark, dir),
      rows(10, 100).unionByName(staged))
    assert(SnapshotTable.stagedIds(dir).isEmpty, "staged manifest consumed")
  }

  test("WAP: publishStaged is idempotent under replay (crash between publish and cleanup)") {
    val dir = tmpTable()
    SnapshotTable.append(spark, dir, rows(0, 50))
    val sid = SnapshotTable.stageCommit(spark, dir, rows(50, 70))
    val stagedFile = Paths.get(dir, "meta", s"staged-$sid.json")
    val backup = Files.createTempFile("staged-backup", ".json")
    Files.copy(stagedFile, backup, StandardCopyOption.REPLACE_EXISTING)
    val first = SnapshotTable.publishStaged(dir, sid)
    // simulate the crash: the staged manifest survived the publish
    Files.copy(backup, stagedFile)
    val second = SnapshotTable.publishStaged(dir, sid)
    assert(second.id === first.id, "replay resolves to the published snapshot")
    assert(SnapshotTable.currentSnapshotId(dir) === Some(first.id))
    assert(SnapshotTable.read(spark, dir).count() === 70L, "no double append")
    // and a third call with no staged file left resolves via the wap tag
    assert(SnapshotTable.publishStaged(dir, sid).id === first.id)
  }

  test("WAP: a commit landing during the audit composes — publish stacks on the new head") {
    val dir = tmpTable()
    SnapshotTable.append(spark, dir, rows(0, 50))
    val sid = SnapshotTable.stageCommit(spark, dir, rows(50, 70))
    SnapshotTable.append(spark, dir, rows(70, 80)) // concurrent commit mid-audit
    val snap = SnapshotTable.publishStaged(dir, sid)
    assert(snap.id === 3L && snap.parentId === Some(2L))
    assertSameRows(SnapshotTable.read(spark, dir), rows(0, 80))
  }

  test("WAP: staged files survive GC until dropped; dropStaged releases them to the orphan sweep") {
    val dir = tmpTable()
    SnapshotTable.append(spark, dir, rows(0, 50))
    SnapshotTable.append(spark, dir, rows(50, 60))
    val sid = SnapshotTable.stageCommit(spark, dir, rows(60, 70))
    val stagedDataDirs = {
      import scala.jdk.CollectionConverters._
      val l = Files.list(Paths.get(dir, "data"))
      try l.iterator().asScala.map(_.getFileName.toString).toSet finally l.close()
    }
    SnapshotTable.expireSnapshots(dir, keepLast = 2, orphanMinAgeMs = 0L)
    assert(SnapshotTable.readStaged(spark, dir, sid).count() === 70L,
      "an audit in flight must not lose its candidate to GC")
    assert(SnapshotTable.dropStaged(dir, sid))
    assert(!SnapshotTable.dropStaged(dir, sid), "second drop is a no-op")
    SnapshotTable.expireSnapshots(dir, keepLast = 2, orphanMinAgeMs = 0L)
    val after = {
      import scala.jdk.CollectionConverters._
      val l = Files.list(Paths.get(dir, "data"))
      try l.iterator().asScala.map(_.getFileName.toString).toSet finally l.close()
    }
    assert(after.size < stagedDataDirs.size, "dropped staged files reclaimed")
    assert(SnapshotTable.read(spark, dir).count() === 60L)
  }

  test("metadataTable('staged') lists pending audits") {
    val dir = tmpTable()
    SnapshotTable.append(spark, dir, rows(0, 10))
    val sid = SnapshotTable.stageCommit(spark, dir, rows(10, 30))
    val md = SnapshotTable.metadataTable(spark, dir, "staged")
    val row = md.collect().toSeq
    assert(row.map(_.getString(0)) === Seq(sid))
    assert(row.head.getAs[Long]("total_rows") === 20L)
    SnapshotTable.dropStaged(dir, sid)
    assert(SnapshotTable.metadataTable(spark, dir, "staged").count() === 0L)
  }

  // -------------------------------------------------------------- rollback

  test("rollback republishes the target's exact state, metadata-only, sequence stamps kept") {
    val dir = tmpTable()
    SnapshotTable.append(spark, dir, rows(0, 100))                       // 1
    SnapshotTable.deleteKeys(spark, dir, "id", rows(0, 10).select("id")) // 2
    SnapshotTable.append(spark, dir, rows(100, 200))                     // 3 (bad)
    val dataDirsBefore = {
      import scala.jdk.CollectionConverters._
      val l = Files.list(Paths.get(dir, "data"))
      try l.iterator().asScala.size finally l.close()
    }
    val rb = SnapshotTable.rollbackTo(dir, 2L)                           // 4
    assert(rb.id === 4L && rb.operation === "rollback")
    val dataDirsAfter = {
      import scala.jdk.CollectionConverters._
      val l = Files.list(Paths.get(dir, "data"))
      try l.iterator().asScala.size finally l.close()
    }
    assert(dataDirsAfter === dataDirsBefore, "rollback writes no data")
    assertSameRows(SnapshotTable.read(spark, dir), rows(10, 100))
    // original addedAt stamps survive: a post-rollback append re-inserting
    // tombstoned keys is YOUNGER than the carried tombstone -> alive
    SnapshotTable.append(spark, dir, rows(0, 5))                         // 5
    assertSameRows(SnapshotTable.read(spark, dir),
      rows(0, 5).unionByName(rows(10, 100)))
    // the rolled-back-over snapshot stays time-travelable until retention
    assert(SnapshotTable.read(spark, dir, Some(3L)).count() === 190L)
    // incremental consumers must not silently cross the boundary
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.changes(spark, dir, 3L, 4L)
    }
    assert(e.getMessage.contains("rollback"))
  }

  test("rollback to the current head is a no-op; expired targets are refused") {
    val dir = tmpTable()
    SnapshotTable.append(spark, dir, rows(0, 10))
    val s2 = SnapshotTable.append(spark, dir, rows(10, 20))
    assert(SnapshotTable.rollbackTo(dir, 2L).id === s2.id)
    assert(SnapshotTable.currentSnapshotId(dir) === Some(2L),
      "no-op rollback publishes nothing")
    // the race branch itself — publish() losing against an occupied id —
    // is covered by SnapshotTableSpec's first-writer-wins cases; here the
    // other refusal: a rollback target outside retention
    SnapshotTable.expireSnapshots(dir, keepLast = 1, orphanMinAgeMs = 0L)
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.rollbackTo(dir, 1L)
    }
    assert(e.getMessage.contains("no snapshot 1"))
  }
}
