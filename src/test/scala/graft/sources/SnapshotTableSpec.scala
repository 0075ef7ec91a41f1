package graft.sources

import graft.SparkSpec
import graft.pipeline.Lineage
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class SnapshotTableSpec extends SparkSpec {
  import spark.implicits._

  private def rows(from: Long, until: Long) =
    spark.range(from, until)
      .withColumn("entity", pmod(col("id"), lit(8)))
      .withColumn("ts", expr("timestampadd(MINUTE, CAST(id AS INT), timestamp'2024-01-01')"))
      .withColumn("v", col("id").cast("double"))

  private def tmpTable(): String =
    Files.createTempDirectory("graft-snap").toString

  test("append commits stack; latest read = union; time travel = old version") {
    val dir = tmpTable()
    val s1 = SnapshotTable.append(spark, dir, rows(0, 100))
    val s2 = SnapshotTable.append(spark, dir, rows(100, 250))
    assert(s1.id === 1L && s2.id === 2L && s2.parentId === Some(1L))
    assert(s1.totalRows === 100L && s2.totalRows === 250L)
    assert(SnapshotTable.currentSnapshotId(dir) === Some(2L))
    assert(SnapshotTable.read(spark, dir).count() === 250L)
    // time travel: snapshot 1 is unchanged by the later commit
    assertSameRows(SnapshotTable.read(spark, dir, Some(1L)), rows(0, 100))
  }

  test("overwrite replaces the live set; prior snapshot still readable") {
    val dir = tmpTable()
    SnapshotTable.append(spark, dir, rows(0, 100))
    val s2 = SnapshotTable.overwrite(spark, dir, rows(500, 520))
    assert(s2.operation === "overwrite" && s2.totalRows === 20L)
    assert(SnapshotTable.read(spark, dir).count() === 20L)
    assert(SnapshotTable.read(spark, dir, Some(1L)).count() === 100L)
  }

  test("per-file stats come from footers: manifest total_rows needs no scan") {
    val dir = tmpTable()
    val s1 = SnapshotTable.append(spark, dir, rows(0, 123).repartition(3))
    assert(s1.files.length === 3)
    assert(s1.files.map(_.rows).sum === 123L)
    assert(s1.files.forall(_.bytes > 0))
    // manifests store table-root-relative paths: the table moves as a unit
    assert(s1.files.forall(f => f.path.startsWith("data/") && !f.path.startsWith("/")))
    val moved = dir + "-moved"
    Files.move(Paths.get(dir), Paths.get(moved))
    assert(SnapshotTable.read(spark, moved).count() === 123L)
  }

  test("publish race: first writer wins, commit loop retries on top of the winner") {
    val dir = tmpTable()
    val s1 = SnapshotTable.append(spark, dir, rows(0, 50))
    // simulate a concurrent committer publishing id 2 first
    val winner = s1.copy(id = 2L, parentId = Some(1L))
    assert(SnapshotTable.publish(dir, winner))
    assert(!SnapshotTable.publish(dir, winner), "second publish of one id must lose")
    // a normal commit observes the raced head and lands at id 3 including
    // BOTH the winner's files and its own
    val s3 = SnapshotTable.append(spark, dir, rows(50, 80))
    assert(s3.id === 3L && s3.parentId === Some(2L))
    assert(s3.files.map(_.path).toSet.size === s3.files.size)
    assert(s3.totalRows === winner.totalRows + 30L)
  }

  test("changes: incremental append scan yields exactly the added rows") {
    val dir = tmpTable()
    SnapshotTable.append(spark, dir, rows(0, 100))
    SnapshotTable.append(spark, dir, rows(100, 160))
    SnapshotTable.append(spark, dir, rows(160, 200))
    assertSameRows(SnapshotTable.changes(spark, dir, 1L, 3L), rows(100, 200))
    assertSameRows(SnapshotTable.changes(spark, dir, 2L, 3L), rows(160, 200))
    // crossing an overwrite is refused, not silently wrong
    SnapshotTable.overwrite(spark, dir, rows(0, 10))
    intercept[IllegalArgumentException] {
      SnapshotTable.changes(spark, dir, 3L, 4L)
    }
  }

  test("expireSnapshots keeps retained versions readable and GCs dead commit dirs") {
    val dir = tmpTable()
    SnapshotTable.append(spark, dir, rows(0, 100)) // files only live via snap1/2
    SnapshotTable.overwrite(spark, dir, rows(200, 230)) // drops snap1's files
    SnapshotTable.append(spark, dir, rows(230, 250))
    val (manifestsGone, filesGone) = SnapshotTable.expireSnapshots(dir, keepLast = 2)
    assert(manifestsGone === 1)
    assert(filesGone > 0, "snapshot 1's files are unreachable and must be deleted")
    intercept[IllegalArgumentException] { SnapshotTable.snapshot(dir, 1L) }
    assert(SnapshotTable.read(spark, dir, Some(2L)).count() === 30L)
    assert(SnapshotTable.read(spark, dir).count() === 50L)
    // the WHOLE dead commit directory is reclaimed (incl. _SUCCESS/.crc
    // sidecars), not just its .parquet files — only the two live commit
    // dirs remain
    val dataDirs = new java.io.File(s"$dir/data").listFiles().filter(_.isDirectory)
    assert(dataDirs.length === 2, s"dead commit dir survived: ${dataDirs.mkString(",")}")
  }

  test("expireSnapshots never deletes a young never-referenced dir (in-flight commit)") {
    val dir = tmpTable()
    SnapshotTable.append(spark, dir, rows(0, 50))
    SnapshotTable.append(spark, dir, rows(50, 80))
    // an in-flight commit: data written, manifest not yet published
    val inflight = Paths.get(dir, "data", "c-inflight000")
    Files.createDirectories(inflight)
    Files.write(inflight.resolve("part-0.parquet"), Array[Byte](1, 2, 3))
    SnapshotTable.expireSnapshots(dir, keepLast = 1)
    assert(Files.exists(inflight), "in-flight commit dir must survive the min-age guard")
    // once past the retention age it is a crash orphan and is reclaimed
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 7200000L)
    Files.setLastModifiedTime(inflight, old)
    Files.setLastModifiedTime(inflight.resolve("part-0.parquet"), old)
    SnapshotTable.expireSnapshots(dir, keepLast = 1)
    assert(!Files.exists(inflight), "aged orphan must be reclaimed")
  }

  test("zero-file snapshots read as typed empty tables (manifest schema)") {
    val dir = tmpTable()
    SnapshotTable.append(spark, dir, rows(0, 0)) // empty first commit
    val empty = SnapshotTable.read(spark, dir)
    assert(empty.count() === 0L)
    assert(empty.columns.toSeq === Seq("id", "entity", "ts", "v"))
    // an incremental consumer scheduled before the producer has data
    // bootstraps on the empty snapshot instead of crashing
    val cursor = s"$dir.cursor"
    var ran = false
    assert(graft.pipeline.Incremental.processNew(spark, dir, cursor) { df =>
      ran = true; assert(df.count() === 0L)
    } === Some((0L, 1L)))
    assert(ran)
    // and readRange over it is a typed empty result, not a refusal
    assert(SnapshotTable.readRange(spark, dir, "id", 0L, 10L).count() === 0L)
  }

  test("readRange skips files by manifest min/max and stays exact") {
    val dir = tmpTable()
    // range-partitioned write: 4 files with disjoint id ranges, so the
    // footer-derived per-file (min,max) really partition the key space
    val s1 = SnapshotTable.commit(spark, dir,
      rows(0, 1000).repartitionByRange(4, col("id")),
      statsCols = Seq("id"))
    assert(s1.files.length === 4)
    assert(s1.files.forall(_.stats.exists(_._1 == "id")))
    val covered = s1.files.flatMap(_.stats.map { case (_, mn, mx) => (mn, mx) }).sorted
    assert(covered.head._1 === 0L && covered.map(_._2).max === 999L)

    // a narrow range plans over ONE file, not four, and matches a full scan
    val narrow = SnapshotTable.readRange(spark, dir, "id", 10L, 20L)
    assert(narrow.inputFiles.length === 1, "file skipping did not prune")
    assertSameRows(narrow, rows(0, 1000).where(col("id").between(10, 20)))

    // a fully-out-of-range read is empty but keeps the schema
    val none = SnapshotTable.readRange(spark, dir, "id", 5000L, 6000L)
    assert(none.count() === 0L && none.columns.contains("v"))

    // a column without recorded stats: nothing skipped, result still exact
    val noStats = SnapshotTable.readRange(spark, dir, "entity", 2L, 3L)
    assert(noStats.inputFiles.length === 4)
    assertSameRows(noStats, rows(0, 1000).where(col("entity").between(2, 3)))

    // a range read must never resurrect deleted rows: file skipping
    // composes with the tombstone anti-join (and re-inserts after the
    // delete still survive it, sequence semantics intact)
    SnapshotTable.deleteKeys(spark, dir, "id", spark.range(12, 15).toDF("id"))
    assertSameRows(SnapshotTable.readRange(spark, dir, "id", 10L, 20L),
      rows(0, 1000).where(col("id").between(10, 20) && !col("id").between(12, 14)))
    SnapshotTable.append(spark, dir, rows(13, 14))
    assertSameRows(SnapshotTable.readRange(spark, dir, "id", 10L, 20L),
      rows(0, 1000).where(col("id").between(10, 20) && !col("id").between(12, 14))
        .union(rows(13, 14)))

    // a scheduled compaction must not strip the table's stats columns —
    // the rewrite inherits them from the source snapshot's files, so
    // range reads keep pruning afterwards
    val comp = SnapshotTable.compact(spark, dir, targetFiles = 2)
    assert(comp.files.forall(_.stats.exists(_._1 == "id")),
      "compaction must inherit the source snapshot's stats columns")
    assertSameRows(SnapshotTable.readRange(spark, dir, "id", 10L, 20L),
      rows(0, 1000).where(col("id").between(10, 20) && !col("id").between(12, 14))
        .union(rows(13, 14)))
  }

  test("readRange on a timestamp stats column prunes by epoch micros") {
    val dir = tmpTable()
    // INT96 (Spark's legacy default) has no footer stats by parquet spec —
    // time-keyed skipping requires the int64-micros encoding Iceberg mandates
    val key = "spark.sql.parquet.outputTimestampType"
    val prior = spark.conf.get(key)
    spark.conf.set(key, "TIMESTAMP_MICROS")
    try SnapshotTable.commit(spark, dir,
      rows(0, 600).repartitionByRange(3, col("ts")), statsCols = Seq("ts"))
    finally spark.conf.set(key, prior)
    // minutes 100-119 live in the first of three range files
    val lo = ts("2024-01-01 01:40:00").getTime * 1000L
    val hi = ts("2024-01-01 01:59:00").getTime * 1000L
    val got = SnapshotTable.readRange(spark, dir, "ts", lo, hi)
    assert(got.inputFiles.length === 1, "timestamp file skipping did not prune")
    assertSameRows(got, rows(0, 600).where(col("id").between(100, 119)))
  }

  test("TIMESTAMP_MILLIS footer stats are refused, never misread as micros") {
    val dir = tmpTable()
    // a table written with millisecond-unit int64 timestamps has footer
    // min/max in MILLIS; recording them would make readRange (which
    // compares in MICROS) silently skip in-range files — the manifest must
    // carry NO stats for such files so they are always read
    val key = "spark.sql.parquet.outputTimestampType"
    val prior = spark.conf.get(key)
    spark.conf.set(key, "TIMESTAMP_MILLIS")
    val s1 =
      try SnapshotTable.commit(spark, dir,
        rows(0, 600).repartitionByRange(3, col("ts")), statsCols = Seq("ts"))
      finally spark.conf.set(key, prior)
    assert(s1.files.forall(_.stats.isEmpty),
      "millis-unit stats must not be recorded")
    // correctness unharmed: all files read, result exact
    val lo = ts("2024-01-01 01:40:00").getTime * 1000L
    val hi = ts("2024-01-01 01:59:00").getTime * 1000L
    val got = SnapshotTable.readRange(spark, dir, "ts", lo, hi)
    assert(got.inputFiles.length === 3, "stats-free files must all be read")
    assertSameRows(got, rows(0, 600).where(col("id").between(100, 119)))
  }

  test("multi-column manifest stats: entity + time pruning compose") {
    val dir = tmpTable()
    // clustered on (k major, id minor): each of 4 files holds one k value
    // and a contiguous id range, so BOTH columns' bounds are selective
    val df = spark.range(0, 1000).toDF("id")
      .withColumn("k", (col("id") / lit(250)).cast("long"))
      .withColumn("v", col("id").cast("double"))
    val s1 = SnapshotTable.commit(spark, dir,
      df.repartitionByRange(4, col("k"), col("id")),
      statsCols = Seq("k", "id"))
    assert(s1.files.length === 4)
    assert(s1.files.forall(f =>
      f.stats.exists(_._1 == "k") && f.stats.exists(_._1 == "id")))

    // single-dimension pruning: id <= 499 keeps 2 files; k == 1 keeps 1
    assert(SnapshotTable.prunedFiles(s1, Seq(("id", 0L, 499L))).length === 2)
    assert(SnapshotTable.prunedFiles(s1, Seq(("k", 1L, 1L))).length === 1)
    // composed: k in [1,2] keeps files 1,2 but id in [260,270] cuts to 1 —
    // the intersection, not either dimension alone
    assert(SnapshotTable.prunedFiles(s1,
      Seq(("k", 1L, 2L), ("id", 260L, 270L))).length === 1)

    val got = SnapshotTable.readRangeMulti(spark, dir,
      Seq(("k", 1L, 2L), ("id", 260L, 270L)))
    assert(got.inputFiles.length === 1, "two-column pruning did not compose")
    assertSameRows(got,
      df.where(col("k").between(1, 2) && col("id").between(260, 270)))

    // a range column with no recorded stats never skips — exact, all files
    val noStats = SnapshotTable.readRangeMulti(spark, dir,
      Seq(("v", 100L, 200L)))
    assert(noStats.inputFiles.length === 4)
    assertSameRows(noStats, df.where(col("v").between(100, 200)))
  }

  test("bucketed snapshot: pinned read plans the as-of chain with zero exchanges") {
    import graft.sources.SnapshotTable.BucketSpec
    val probeDir = tmpTable(); val buildDir = tmpTable()
    val probe = (0 until 400).map(i => (i % 7L, i.toLong, i * 1.5))
      .toDF("entity", "ts", "v")
    val build = (0 until 80).map(i => (i % 7L, (i * 5).toLong, s"lab$i"))
      .toDF("entity", "lts", "label")
    val pSpec = BucketSpec(4, "entity", Seq("entity", "ts"))
    val bSpec = BucketSpec(4, "entity", Seq("entity", "lts"))
    SnapshotTable.commitBucketed(spark, probeDir, probe, pSpec)
    SnapshotTable.commitBucketed(spark, buildDir, build, bSpec)
    assert(SnapshotTable.snapshot(probeDir, 1L).bucketSpec === Some(pSpec))

    // pin snapshot 1 of the probe side, then let a concurrent append land
    val pinned = SnapshotTable.readBucketed(spark, probeDir, Some(1L))
    SnapshotTable.commitBucketed(spark, probeDir,
      (400 until 500).map(i => (i % 7L, i.toLong, i * 1.5))
        .toDF("entity", "ts", "v"), pSpec)
    assert(SnapshotTable.currentSnapshotId(probeDir) === Some(2L))

    val joined = graft.ops.AsOfJoin.asOfSortMerge(
        pinned, SnapshotTable.readBucketed(spark, buildDir),
        "entity", "ts", "lts", Seq("label"), dedupeLatest = false)
      .groupBy("entity")
      .agg(count(lit(1)).as("n"), count("label").as("labeled"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfMergeJoin"), s"custom exec missing:\n$plan")
    assert(!plan.contains("Exchange"),
      s"pinned bucketed snapshot read still shuffles:\n$plan")

    // the PIN holds: exactly snapshot 1's 400 rows — the concurrent
    // append leaked nothing — and values match the in-memory (shuffled) run
    assert(joined.agg(sum("n")).collect()(0).getLong(0) === 400L)
    val reference = graft.ops.AsOfJoin.asOfSortMerge(probe, build,
        "entity", "ts", "lts", Seq("label"), dedupeLatest = false)
      .groupBy("entity")
      .agg(count(lit(1)).as("n"), count("label").as("labeled"))
    assertSameRows(joined, reference)

    // the latest read DOES see the append, still exchange-free over the
    // multi-commit view (sorts become partition-local; no shuffle appears)
    val latest = SnapshotTable.readBucketed(spark, probeDir)
    assert(latest.count() === 500L)
    val latestJoin = graft.ops.AsOfJoin.asOfSortMerge(
      latest, SnapshotTable.readBucketed(spark, buildDir),
      "entity", "ts", "lts", Seq("label"), dedupeLatest = false)
    assert(!latestJoin.queryExecution.executedPlan.toString.contains("Exchange"))
    assert(latestJoin.count() === 500L)
  }

  test("bucketed snapshot: layout mismatches on append are refused") {
    import graft.sources.SnapshotTable.BucketSpec
    val dir = tmpTable()
    val df = (0 until 50).map(i => (i % 3L, i.toLong)).toDF("entity", "ts")
    val spec = BucketSpec(4, "entity", Seq("entity", "ts"))
    SnapshotTable.commitBucketed(spark, dir, df, spec)
    // a plain append would silently break the layout every reader plans on
    intercept[IllegalArgumentException] { SnapshotTable.append(spark, dir, df) }
    // so would a different bucket count / column
    intercept[IllegalArgumentException] {
      SnapshotTable.commitBucketed(spark, dir, df,
        BucketSpec(8, "entity", Seq("entity", "ts")))
    }
    // an overwrite RESETS the layout (and read() refuses readBucketed after)
    SnapshotTable.overwrite(spark, dir, df)
    assert(SnapshotTable.snapshot(dir, 2L).bucketSpec === None)
    intercept[RuntimeException] { SnapshotTable.readBucketed(spark, dir) }
    // bucketing onto the unbucketed head must also be an overwrite
    intercept[IllegalArgumentException] {
      SnapshotTable.commitBucketed(spark, dir, df, spec)
    }
    SnapshotTable.commitBucketed(spark, dir, df, spec, operation = "overwrite")
    assert(SnapshotTable.readBucketed(spark, dir).count() === 50L)
  }

  test("expireSnapshots deletes expired snapshots' view farms with them") {
    import graft.sources.SnapshotTable.BucketSpec
    val dir = tmpTable()
    val spec = BucketSpec(2, "entity", Seq("entity", "ts"))
    val df1 = (0 until 30).map(i => (i % 3L, i.toLong)).toDF("entity", "ts")
    SnapshotTable.commitBucketed(spark, dir, df1, spec)
    SnapshotTable.readBucketed(spark, dir, Some(1L)) // materializes view 1
    SnapshotTable.commitBucketed(spark, dir, df1, spec)
    SnapshotTable.readBucketed(spark, dir, Some(2L)) // view 2
    assert(Files.isDirectory(Paths.get(dir, "views", "snap-00000001")))
    SnapshotTable.expireSnapshots(dir, keepLast = 1)
    assert(!Files.exists(Paths.get(dir, "views", "snap-00000001")),
      "expired view farm must be deleted (its links pin dead inodes)")
    assert(Files.isDirectory(Paths.get(dir, "views", "snap-00000002")),
      "retained snapshot's view must survive")
    assert(SnapshotTable.readBucketed(spark, dir).count() === 60L)
  }

  test("a pin is bound to its table: a foreign table fails loudly") {
    val dirA = tmpTable(); val dirB = tmpTable()
    val linDir = Files.createTempDirectory("graft-pin-bind").toString + "/lineage"
    SnapshotTable.append(spark, dirA, rows(0, 30))
    SnapshotTable.append(spark, dirB, rows(0, 30))
    assert(Lineage.pinSnapshot(dirA, linDir) === 1L)
    // same lineage dir, different table: the stale pin id (which DOES
    // exist in dirB) must not be silently applied to dirB
    val err = intercept[IllegalArgumentException] {
      Lineage.pinSnapshot(dirB, linDir)
    }
    assert(err.getMessage.contains("foreign pin"))
    // re-reading against the original table still works
    assert(Lineage.pinSnapshot(dirA, linDir) === 1L)
  }

  test("expireSnapshots sweeps aged publish-staging orphans from meta/") {
    val dir = tmpTable()
    SnapshotTable.append(spark, dir, rows(0, 10))
    val meta = Paths.get(dir, "meta")
    val orphan = Files.createTempFile(meta, ".snap-staging", ".json")
    Files.setLastModifiedTime(orphan,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 10000))
    // younger than the min age: kept (may be an in-flight publish)
    SnapshotTable.expireSnapshots(dir, keepLast = 1, orphanMinAgeMs = 60000L)
    assert(Files.exists(orphan))
    // older than the min age: swept
    SnapshotTable.expireSnapshots(dir, keepLast = 1, orphanMinAgeMs = 5000L)
    assert(!Files.exists(orphan))
  }

  test("snap: source spec reads latest or a pinned snapshot via option:") {
    val dir = tmpTable()
    SnapshotTable.append(spark, dir, rows(0, 40))
    SnapshotTable.append(spark, dir, rows(40, 100))
    val synth = (s: org.apache.spark.sql.SparkSession, n: Long) => rows(0, n)
    assert(TableSource.load(spark, s"snap:$dir", synth).count() === 100L)
    assert(TableSource.load(spark, s"option:snapshot-id=1;snap:$dir", synth).count() === 40L)
    intercept[IllegalArgumentException] {
      TableSource.load(spark, s"option:mergeSchema=true;snap:$dir", synth)
    }
    // tags resolve through the spec surface too
    SnapshotTable.createTag(dir, "v1", Some(1L))
    assert(TableSource.load(spark, s"option:snapshot-tag=v1;snap:$dir", synth)
      .count() === 40L)
    intercept[RuntimeException] {
      TableSource.load(spark, s"option:snapshot-tag=nope;snap:$dir", synth)
    }
    intercept[IllegalArgumentException] {
      TableSource.load(spark,
        s"option:snapshot-id=1;option:snapshot-tag=v1;snap:$dir", synth)
    }
  }

  test("changes stays exact over legacy manifests lacking added_at stamps") {
    val dir = tmpTable()
    SnapshotTable.append(spark, dir, rows(0, 30))
    SnapshotTable.append(spark, dir, rows(30, 50))
    // simulate a pre-upgrade log: strip the addedAt stamps in place (the
    // legacy parse default is 0 — an addedAt == id filter would return a
    // silently EMPTY diff here, the worst failure mode for a consumer)
    (1L to 2L).foreach { id =>
      val stripped = SnapshotTable.snapshot(dir, id)
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(dir, "meta", f"snap-$id%08d.json"))
      assert(SnapshotTable.publish(dir,
        stripped.copy(files = stripped.files.map(_.copy(addedAt = 0L)))))
    }
    assert(SnapshotTable.snapshot(dir, 2L).files.forall(_.addedAt == 0L))
    assertSameRows(SnapshotTable.changes(spark, dir, 1L, 2L), rows(30, 50))
    // and a post-upgrade append on the same table diffs exactly too
    SnapshotTable.append(spark, dir, rows(50, 60))
    assertSameRows(SnapshotTable.changes(spark, dir, 2L, 3L), rows(50, 60))
  }

  test("metadata tables: snapshots/files/deletes/refs introspection") {
    val dir = tmpTable()
    SnapshotTable.commit(spark, dir, rows(0, 100).repartition(2),
      statsCols = Seq("id"))
    SnapshotTable.deleteKeys(spark, dir, "id", spark.range(0, 10).toDF("id"))
    SnapshotTable.append(spark, dir, rows(100, 120).coalesce(1))
    SnapshotTable.createTag(dir, "v1", Some(1L))

    val snaps = SnapshotTable.metadataTable(spark, dir, "snapshots")
    assert(snaps.count() === 3)
    assert(snaps.orderBy("snapshot_id").select("operation")
      .as[String].collect().toSeq === Seq("append", "delete", "append"))
    assert(snaps.where(col("snapshot_id") === 2L)
      .select("n_delete_files").as[Long].head() >= 1L)

    // files: the CURRENT live set with manifest stats; pinned = snapshot 1
    val files = SnapshotTable.metadataTable(spark, dir, "files")
    assert(files.count() === 3)
    assert(files.where(col("added_at") === 1L).count() === 2)
    val stats = files.where(col("added_at") === 1L)
      .select("stats").as[Map[String, Seq[Long]]].head()
    assert(stats.contains("id") && stats("id").length === 2)
    assert(SnapshotTable.metadataTable(spark, dir, "files", Some(1L))
      .count() === 2)

    val dels = SnapshotTable.metadataTable(spark, dir, "deletes")
    assert(dels.count() >= 1)
    assert(dels.agg(sum(col("rows"))).as[Long].head() === 10L,
      "tombstone rows must sum to the takedown list")
    assert(dels.select("key_col").distinct().as[String].collect().toSeq
      === Seq("id"))

    val refs = SnapshotTable.metadataTable(spark, dir, "refs")
    assert(refs.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      === Seq(("v1", 1L)))

    intercept[RuntimeException] {
      SnapshotTable.metadataTable(spark, dir, "nope")
    }
  }

  test("tags: immutable release names pin snapshots against retention GC") {
    val dir = tmpTable()
    SnapshotTable.append(spark, dir, rows(0, 50))           // 1
    assert(SnapshotTable.createTag(dir, "v1") === 1L)       // tags the head
    SnapshotTable.overwrite(spark, dir, rows(100, 150))     // 2: drops 1's files
    SnapshotTable.append(spark, dir, rows(150, 160))        // 3
    // re-creating at the same target is a no-op; MOVING a tag is refused
    assert(SnapshotTable.createTag(dir, "v1", Some(1L)) === 1L)
    intercept[IllegalArgumentException] {
      SnapshotTable.createTag(dir, "v1", Some(3L))
    }
    intercept[IllegalArgumentException] {
      SnapshotTable.createTag(dir, "bad name")
    }
    assert(SnapshotTable.tags(dir) === Map("v1" -> 1L))

    // GC with keepLast=1: snapshot 2 expires, but the tagged snapshot 1 —
    // whose files head no longer references — must survive with its DATA
    val (nManifests, nFiles) =
      SnapshotTable.expireSnapshots(dir, keepLast = 1, orphanMinAgeMs = 0L)
    assert(nManifests === 1 && nFiles === 0,
      "the tagged snapshot's manifest and files must survive GC")
    assertSameRows(SnapshotTable.read(spark, dir, Some(1L)), rows(0, 50))
    assert(SnapshotTable.read(spark, dir).count() === 60L)

    // dropping the tag releases the snapshot to normal retention
    assert(SnapshotTable.dropTag(dir, "v1"))
    assert(!SnapshotTable.dropTag(dir, "v1"))
    val (nm2, nf2) =
      SnapshotTable.expireSnapshots(dir, keepLast = 1, orphanMinAgeMs = 0L)
    assert(nm2 === 1 && nf2 > 0, "dropTag must release the files to GC")
    intercept[IllegalArgumentException] { SnapshotTable.snapshot(dir, 1L) }
  }

  test("randomized op sequences: latest reads AND incremental windows replay the log") {
    // append / overwrite / DELETE / COMPACT drawn at random, checked after
    // every commit against an in-memory replay of the log — including the
    // sequence-semantics subtlety: a delete never touches keys appended
    // after it, even when the same key value is re-used (the replay keeps
    // a multiset keyed by insertion order, exactly what addedAt encodes).
    // After every commit, random changes(a, head] windows are ALSO checked
    // against the per-commit replay: a window's expected delta is each
    // in-window append's keys minus the keys of in-window deletes YOUNGER
    // than that append; replace commits (compaction) contribute nothing;
    // windows containing an overwrite are skipped (changes refuses them).
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { _ =>
      val dir = tmpTable()
      var expected = Vector.empty[Long]
      var log = Vector.empty[(Long, String, Vector[Long])]
      var nextId = 0L
      (1 to 10).foreach { _ =>
        rnd.nextInt(8) match {
          case 0 =>
            val n = 1L + rnd.nextInt(50)
            val batch = nextId until (nextId + n); nextId += n
            val s = SnapshotTable.overwrite(spark, dir,
              spark.range(batch.start, batch.end).toDF("id"))
            log :+= ((s.id, "overwrite", batch.toVector))
            expected = batch.toVector
          case 1 | 2 if expected.nonEmpty =>
            // delete a random slice of CURRENT keys plus some absent ones
            val victims = rnd.shuffle(expected.distinct)
              .take(1 + rnd.nextInt(math.max(1, expected.distinct.size / 2)))
            val absent = Seq(nextId + 1000L, nextId + 1001L)
            val s = SnapshotTable.deleteKeys(spark, dir, "id",
              (victims ++ absent).toDF("id"))
            log :+= ((s.id, "delete", (victims ++ absent).toVector))
            expected = expected.filterNot(victims.toSet)
          case 3 if expected.nonEmpty =>
            val s = SnapshotTable.compact(spark, dir, targetFiles = 2)
            log :+= ((s.id, "replace", Vector.empty))
          case 4 =>
            // re-insert keys that may have been deleted before: they must
            // survive any PREVIOUS delete (only future ones can hit them)
            val reused = expected.headOption.getOrElse(0L)
            val s = SnapshotTable.append(spark, dir, Seq(reused).toDF("id"))
            log :+= ((s.id, "append", Vector(reused)))
            expected :+= reused
          case _ =>
            val n = 1L + rnd.nextInt(50)
            val batch = nextId until (nextId + n); nextId += n
            val s = SnapshotTable.append(spark, dir,
              spark.range(batch.start, batch.end).toDF("id"))
            log :+= ((s.id, "append", batch.toVector))
            expected ++= batch
        }
        val got = SnapshotTable.read(spark, dir)
          .select("id").as[Long].collect().sorted.toSeq
        assert(got === expected.sorted, s"divergence after ${expected.size} expected rows")

        // incremental-window fuzz against the same log
        val head = log.last._1
        (1 to 2).foreach { _ =>
          val a = 1L + rnd.nextInt(head.toInt)
          val window = log.filter(e => e._1 > a && e._1 <= head)
          if (window.nonEmpty && !window.exists(_._2 == "overwrite")) {
            val exp = window.flatMap {
              case (c, "append", keys) =>
                val laterDels = window.collect {
                  case (d, "delete", ks) if d > c => ks
                }.flatten.toSet
                keys.filterNot(laterDels)
              case _ => Vector.empty
            }
            val delta = SnapshotTable.changes(spark, dir, a, head)
              .select("id").as[Long].collect().sorted.toSeq
            assert(delta === exp.sorted, s"changes($a, $head] diverged")
          }
        }
      }
    }
  }

  test("a resume pinned to an expired snapshot fails loudly, not with stale data") {
    val dir = tmpTable()
    val linDir = Files.createTempDirectory("graft-snap-exp").toString + "/lineage"
    SnapshotTable.append(spark, dir, rows(0, 50))
    SnapshotTable.append(spark, dir, rows(50, 80))
    assert(Lineage.pinSnapshot(dir, linDir) === 2L)
    SnapshotTable.append(spark, dir, rows(80, 90))
    SnapshotTable.expireSnapshots(dir, keepLast = 1) // drops snapshots 1 and 2
    val err = intercept[IllegalArgumentException] {
      Lineage.runResumableSnapshot(spark, dir, "entity", "ts", 8,
        s"$linDir-out", linDir)(identity)
    }
    assert(err.getMessage.contains("expired or never committed"))
  }

  test("runResumableSnapshot: resume stays pinned across a concurrent append") {
    val dir = tmpTable()
    val work = Files.createTempDirectory("graft-snap-run").toString
    val outDir = s"$work/out"; val linDir = s"$work/lineage"
    SnapshotTable.append(spark, dir, rows(0, 200))

    // run 1 "dies" after completing half the buckets (the LineageSpec
    // crash model: a bucket-aligned subset finishes before the kill)
    val part1 = SnapshotTable.read(spark, dir)
      .where(Lineage.bucketOf("entity", 8) < 4)
    val pin1 = Lineage.pinSnapshot(dir, linDir)
    assert(pin1 === 1L)
    Lineage.runResumable(spark, part1, "entity", "ts", 8, outDir, linDir)(identity)

    // a concurrent ingest lands between the crash and the resume
    SnapshotTable.append(spark, dir, rows(200, 300))
    assert(SnapshotTable.currentSnapshotId(dir) === Some(2L))

    // the resume must re-read the PINNED snapshot: exactly the 200 rows of
    // snapshot 1, no leakage from the append, no duplicates
    val (pinned, out) = Lineage.runResumableSnapshot(
      spark, dir, "entity", "ts", 8, outDir, linDir)(identity)
    assert(pinned === 1L)
    assert(out.count() === 200L)
    assert(out.agg(max("id")).collect()(0).getLong(0) === 199L)
    assert(out.groupBy("id").count().where(col("count") > 1).count() === 0L)

    // a FRESH job (new lineage dir) pins the current head and sees the append
    val (pinned2, out2) = Lineage.runResumableSnapshot(
      spark, dir, "entity", "ts", 8, s"$work/out2", s"$work/lineage2")(identity)
    assert(pinned2 === 2L)
    assert(out2.count() === 300L)
  }

  test("schema evolution: appended columns read as null from older files; drop/retype refused") {
    val dir = tmpTable()
    SnapshotTable.append(spark, dir, rows(0, 50))
    // add a column: older files read it as null (the manifest schema
    // drives the scan — no mergeSchema footer sweep, no sampler luck)
    SnapshotTable.append(spark, dir, rows(50, 80).withColumn("tag", lit("new")))
    val df = SnapshotTable.read(spark, dir)
    assert(df.columns.contains("tag"))
    assert(df.where(col("tag").isNull).count() === 50L)
    assert(df.where(col("tag") === "new").count() === 30L)
    // time travel: the pre-evolution snapshot has the old schema
    assert(!SnapshotTable.read(spark, dir, Some(1L)).columns.contains("tag"))
    // changes across the evolution: the added files carry the new column
    val delta = SnapshotTable.changes(spark, dir, 1L, 2L)
    assert(delta.columns.contains("tag") && delta.count() === 30L)
    // dropping or retyping a column on append is refused (reads of older
    // files would silently corrupt); an overwrite may do either
    intercept[IllegalArgumentException] {
      SnapshotTable.append(spark, dir, rows(80, 90)) // lacks "tag"
    }
    intercept[IllegalArgumentException] {
      SnapshotTable.append(spark, dir,
        rows(80, 90).withColumn("tag", lit(7L))) // retypes string -> long
    }
    SnapshotTable.overwrite(spark, dir, rows(0, 10))
    assert(!SnapshotTable.read(spark, dir).columns.contains("tag"))

    // bucketed layout: the view DDL comes from the manifest schema, so a
    // widened bucketed table reads old files' new column as null too
    import graft.sources.SnapshotTable.BucketSpec
    val bdir = tmpTable()
    val spec = BucketSpec(4, "entity", Seq("entity", "ts"))
    SnapshotTable.commitBucketed(spark, bdir, rows(0, 40), spec)
    SnapshotTable.commitBucketed(spark, bdir,
      rows(40, 60).withColumn("tag", lit("b")), spec)
    val bread = SnapshotTable.readBucketed(spark, bdir)
    assert(bread.where(col("tag").isNull).count() === 40L)
    assert(bread.where(col("tag") === "b").count() === 20L)
  }

  test("equality deletes: keys removed, re-insert survives, absent key is a no-op") {
    val dir = tmpTable()
    SnapshotTable.append(spark, dir, rows(0, 100))
    // delete ids 10..19 plus an absent key (id 5000) — a takedown list
    // applied verbatim, no pre-probing of the corpus
    val del = SnapshotTable.deleteKeys(spark, dir, "id",
      spark.range(10, 20).union(spark.range(5000, 5001)).toDF("id"))
    assert(del.operation === "delete" && del.id === 2L)
    assert(del.files.map(_.path) ===
      SnapshotTable.snapshot(dir, 1L).files.map(_.path),
      "a delete commit must not touch data files")
    assert(SnapshotTable.read(spark, dir).count() === 90L)
    assertSameRows(SnapshotTable.read(spark, dir),
      rows(0, 100).where(col("id") < 10 || col("id") >= 20))
    // time travel: the pre-delete snapshot still shows all 100 rows
    assert(SnapshotTable.read(spark, dir, Some(1L)).count() === 100L)

    // re-insert AFTER the delete: sequence semantics — the tombstone only
    // applies to files older than it, so the re-inserted rows survive
    SnapshotTable.append(spark, dir, rows(10, 15))
    assertSameRows(SnapshotTable.read(spark, dir),
      rows(0, 100).where(col("id") < 10 || col("id") >= 20)
        .union(rows(10, 15)))

    // a second delete applies to EVERYTHING current (old files and the
    // re-inserted batch alike)
    SnapshotTable.deleteKeys(spark, dir, "id", spark.range(12, 14).toDF("id")
      .union(spark.range(50, 52).toDF("id")))
    assertSameRows(SnapshotTable.read(spark, dir),
      rows(0, 100).where((col("id") < 10 || col("id") >= 20) &&
          !col("id").isin(50L, 51L))
        .union(rows(10, 15).where(!col("id").isin(12L, 13L))))

    // deleting a non-existent column is refused at commit time
    intercept[IllegalArgumentException] {
      SnapshotTable.deleteKeys(spark, dir, "nope", spark.range(1).toDF("nope"))
    }
    // changes TRAVERSES delete commits (a takedown adds no files, so the
    // file-add diff stays exact) with windowed sequence semantics:
    //   snapshots: 1=append 0..99  2=delete {10..19}  3=append 10..14
    //              4=delete {12,13,50,51}
    // a delete-only window is a legitimately empty diff…
    assert(SnapshotTable.changes(spark, dir, 1L, 2L).count() === 0L)
    // …the window's appends arrive with only the tombstones YOUNGER than
    // them applied (snapshot 2's delete predates the re-insert at 3)…
    assertSameRows(SnapshotTable.changes(spark, dir, 1L, 3L), rows(10, 15))
    // …and a tombstone inside the window kills the window's own earlier
    // appends, while rows deleted from PRE-window files (50, 51) are not
    // re-reported — an append scan has no retraction channel
    assertSameRows(SnapshotTable.changes(spark, dir, 1L, 4L),
      rows(10, 15).where(!col("id").isin(12L, 13L)))
    assert(SnapshotTable.changes(spark, dir, 3L, 4L).count() === 0L)
  }

  test("compact: consumes tombstones, collapses small files, refuses to drop a concurrent commit") {
    val dir = tmpTable()
    // an ingest-shaped table: many small appends, then a takedown
    (0 until 5).foreach(i =>
      SnapshotTable.append(spark, dir, rows(i * 40, (i + 1) * 40).repartition(4)))
    SnapshotTable.deleteKeys(spark, dir, "id", spark.range(0, 30).toDF("id"))
    SnapshotTable.append(spark, dir, rows(0, 10)) // re-insert post-delete
    val logical = SnapshotTable.read(spark, dir)
    assert(logical.count() === 180L)
    val preFiles = SnapshotTable.snapshot(dir,
      SnapshotTable.currentSnapshotId(dir).get).files.size
    assert(preFiles >= 21, s"ingest should have fragmented the table, got $preFiles files")

    val compacted = SnapshotTable.compact(spark, dir, targetFiles = 2)
    assert(compacted.operation === "replace")
    assert(compacted.deletes.isEmpty, "compaction must consume tombstones")
    assert(compacted.files.size === 2)
    assertSameRows(SnapshotTable.read(spark, dir),
      rows(30, 200).union(rows(0, 10)))
    // time travel to the pre-compaction snapshot still works until GC
    assert(SnapshotTable.read(spark, dir, Some(compacted.id - 1)).count() === 180L)

    // an incremental consumer whose cursor predates the compaction
    // TRAVERSES it (a replace adds no logical rows): the diff is exactly
    // the window's appends read from their ORIGINAL immutable files, with
    // the window's tombstones applied by sequence — scheduled maintenance
    // must never wedge cursor consumers
    assertSameRows(SnapshotTable.changes(spark, dir, 5L, compacted.id),
      rows(0, 10))
    assert(SnapshotTable.changes(spark, dir, 7L, compacted.id).count() === 0L)

    // conflict check: a rewrite computed from a stale snapshot must refuse
    // to publish once the head moved (it would drop the newer commit's rows)
    val stale = SnapshotTable.currentSnapshotId(dir).get
    SnapshotTable.append(spark, dir, rows(500, 510))
    intercept[IllegalArgumentException] {
      SnapshotTable.compactFrom(spark, dir, stale)
    }

    // GC after compaction: expired tombstone dirs (data/d-*) are swept
    val (gcManifests, gcFiles) = SnapshotTable.expireSnapshots(dir, 1, orphanMinAgeMs = 0L)
    assert(gcManifests > 0 && gcFiles > 0)
    import scala.jdk.CollectionConverters._
    val deadTombs = { val l = Files.list(Paths.get(dir, "data"))
      try l.iterator().asScala.count(_.getFileName.toString.startsWith("d-"))
      finally l.close() }
    assert(deadTombs === 0, "expired tombstone dirs must be GC'd")
    assert(SnapshotTable.read(spark, dir).count() === 190L)
  }

  test("bucketed deletes: broadcast anti-join keeps the scan exchange-free; fragmented layout is refused") {
    import graft.sources.SnapshotTable.BucketSpec
    val dir = tmpTable()
    val spec = BucketSpec(4, "entity", Seq("entity", "ts"))
    SnapshotTable.commitBucketed(spark, dir,
      (0 until 400).map(i => (i % 7L, i.toLong, i * 1.5)).toDF("entity", "ts", "v"),
      spec)
    SnapshotTable.deleteKeys(spark, dir, "entity", Seq(3L).toDF("entity"))

    // uniform case (every tombstone newer than every data file): the
    // delete rides as a broadcast anti-join over the bucketed scan —
    // entity-keyed aggregation still plans with zero exchanges
    val agg = SnapshotTable.readBucketed(spark, dir)
      .groupBy("entity").agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"tombstones should apply as a broadcast anti-join:\n$plan")
    assert(!plan.toLowerCase.contains("exchange hashpartitioning"),
      s"bucketed read with deletes must not shuffle the data side:\n$plan")
    assert(agg.count() === 6L)
    assert(SnapshotTable.readBucketed(spark, dir)
      .where(col("entity") === 3L).count() === 0L)

    // fragment the sequence groups: an append after the delete means the
    // one-directory view can no longer express the split plan — refused
    // with compact() named as the remedy
    SnapshotTable.commitBucketed(spark, dir,
      Seq((3L, 9999L, 1.0)).toDF("entity", "ts", "v"), spec)
    val err = intercept[IllegalArgumentException] {
      SnapshotTable.readBucketed(spark, dir)
    }
    assert(err.getMessage.contains("compact"))
    // read() keeps serving the fragmented state correctly meanwhile
    assert(SnapshotTable.read(spark, dir).where(col("entity") === 3L).count() === 1L)

    // compact preserves the bucket layout and restores the exchange-free
    // bucketed read, now including the re-inserted row
    val compacted = SnapshotTable.compact(spark, dir)
    assert(compacted.bucketSpec === Some(spec))
    val agg2 = SnapshotTable.readBucketed(spark, dir)
      .groupBy("entity").agg(count(lit(1)).as("n"))
    assert(!agg2.queryExecution.executedPlan.toString.contains("Exchange"),
      "post-compaction bucketed read must be exchange-free again")
    assert(agg2.where(col("entity") === 3L).collect()(0).getLong(1) === 1L)
    assert(SnapshotTable.read(spark, dir).count() ===
      400L - 400L / 7L - (if (400L % 7L > 3L) 1L else 0L) + 1L)
  }
}
