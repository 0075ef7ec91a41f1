package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** End-to-end of the spark-submit entry's job body (run against the shared
  * session rather than via Main.main, which builds its own session): synth
  * input -> error split -> features -> post-process -> out + lineage, then
  * a resumed run over the same lineage adds nothing. */
class MainSpec extends SparkSpec {

  test("full job: features + lineage written; resume is a no-op on complete output") {
    val tmp = Files.createTempDirectory("graft-main").toString
    val out = s"$tmp/features"
    val cfg = pipeline.GraftConfig()
    val images = sources.SynthImages.images(spark, 1500, 16)
    val labels = sources.SynthImages.labels(spark, 1500, 16)
    val (good, errors) = sources.ErrorChannel.split(images, sources.ErrorChannel.imageChecks)
    assert(errors.count() === 0) // synthesized input is clean

    pipeline.Lineage.runResumable(spark, good, "phash", "ts", cfg.lineageBuckets,
      out, s"${out}_lineage",
      resultEntityCol = Some("entity"), resultTsCol = Some("window_start")) { in =>
      pipeline.PostProcessor.ordered(
        pipeline.FeaturePipeline.features(in, labels, cfg),
        Seq("entity", "window_start"))
    }
    val n1 = spark.read.parquet(out).count()
    val lineage1 = spark.read.parquet(s"${out}_lineage")
    assert(n1 > 0 && lineage1.count() > 0)
    assert(lineage1.columns.toSet ===
      Set("partition_id", "row_count", "min_ts", "max_ts", "digest"))

    // resume over identical input: all buckets done -> nothing recomputed
    pipeline.Lineage.runResumable(spark, good, "phash", "ts", cfg.lineageBuckets,
      out, s"${out}_lineage",
      resultEntityCol = Some("entity"), resultTsCol = Some("window_start")) { in =>
      pipeline.FeaturePipeline.features(in, labels, cfg)
    }
    assert(spark.read.parquet(out).count() === n1)
  }

  test("--dedup: perceptual dedup stage drops copies before the pipeline") {
    import spark.implicits._
    // synth rows + an exact copy of every 100th image under a new id — the
    // --dedup stage (as Main wires it: error split, then edges + drop)
    // must keep exactly one representative per copy pair
    val base = sources.SynthImages.images(spark, 400, 8)
    val copies = base.where(pmod(expr("CAST(substring(image_id, 4) AS LONG)"), lit(100L)) === 0)
      .withColumn("image_id", concat(lit("dup_"), col("image_id")))
    val all = base.unionByName(copies)
    val (good, _) = sources.ErrorChannel.split(all, sources.ErrorChannel.imageChecks)
    val edges = ops.Dedup.perceptualEdges(good, "image_id", "bytes", maxHamming = 0)
    val deduped = ops.Dedup.dropClusteredDuplicates(good, "image_id", edges)
    val keptIds = deduped.select("image_id").as[String].collect().toSet
    // at maxHamming = 0 components are exactly the aHash-equality classes,
    // so the kept set is one min-id representative per distinct hash value
    val byHash = good
      .select(col("image_id"), functions.ImageFunctions.ahash64(col("bytes")).as("ah"))
      .as[(String, Long)].collect()
      .groupBy(_._2).map { case (_, g) => g.map(_._1).min }.toSet
    assert(keptIds === byHash)
    // the injected copies really collapsed: strictly fewer rows than input
    assert(deduped.count() < all.count())
    assert(Main.parseArgs(List("--dedup", "1"), Map.empty) === Map("dedup" -> "1"))
  }

  test("CLI end-to-end: Main.main with every flag leaves all artifacts in place") {
    // the full spark-submit surface through main() itself (argument
    // parsing, stage ordering, artifact writes) — the component tests
    // below can't catch e.g. the cleanup deleting a stage's output
    // because they wire stages by hand
    val tmp = Files.createTempDirectory("graft-cli").toString
    val out = s"$tmp/features"
    Main.main(Array("--images", "synth:3000", "--labels", "synth:3000",
      "--out", out, "--dedup", "1", "--quality",
      "--split", "train:0.8,val:0.1,test:0.1", "--format", "csv"))
    val feats = spark.read.parquet(out)
    assert(feats.count() > 0)
    assert(feats.columns.contains("split"))
    assert(spark.read.parquet(s"${out}_lineage").count() > 0)
    val metrics = spark.read.parquet(s"${out}_lineage_metrics")
    assert(metrics.count() === 1)
    // the --quality drop manifest must SURVIVE the fresh-run cleanup
    // (regression: cleanup once ran after the stage wrote it)
    val dropped = spark.read.parquet(s"${out}_dropped")
    assert(dropped.count() > 0)
    assert(dropped.columns.toSet === Set("image_id", "reasons"))
    assert(new java.io.File(s"${out}_csv").exists())
    // the borrowed session must survive main()
    assert(!spark.sparkContext.isStopped)

    // resume over the complete output: a no-op that skips the eager dedup
    // fixpoint (lineageComplete) and appends one metrics row recording
    // zero new buckets and rows
    val n1 = feats.count()
    Main.main(Array("--images", "synth:3000", "--labels", "synth:3000",
      "--out", out, "--dedup", "1", "--quality", "--resume",
      "--split", "train:0.8,val:0.1,test:0.1"))
    assert(spark.read.parquet(out).count() === n1)
    val m2 = spark.read.parquet(s"${out}_lineage_metrics")
      .orderBy("run_at_ms").collect()
    assert(m2.length === 2)
    assert(m2(1).getAs[Long]("buckets_completed") === 0L)
    assert(m2(1).getAs[Long]("rows_written") === 0L)
    assert(m2(1).getAs[Long]("buckets_skipped") === m2(0).getAs[Long]("buckets_completed"))
  }

  test("--images snap:: the CLI pins the snapshot; resume keeps it, fresh re-pins") {
    val tmp = Files.createTempDirectory("graft-main-snap").toString
    val table = s"$tmp/corpus"; val out = s"$tmp/features"
    val pin = java.nio.file.Paths.get(s"${out}_lineage.pin")
    sources.SnapshotTable.append(spark, table,
      sources.SynthImages.images(spark, 1500, 16))

    Main.main(Array("--images", s"snap:$table", "--labels", "synth:1500",
      "--out", out))
    val n1 = spark.read.parquet(out).count()
    assert(n1 > 0)
    def pinnedId = Files.readString(pin).trim.linesIterator.toSeq.last
    assert(pinnedId === "1", "first run must pin the head snapshot")
    assert(Files.readString(pin).startsWith(
      java.nio.file.Paths.get(table).toAbsolutePath.normalize.toString),
      "the pin must record which table it pins")

    // ingest lands between the run and its resume: the pin must hold and
    // the resumed run must not recompute anything from the new snapshot
    sources.SnapshotTable.append(spark, table,
      sources.SynthImages.images(spark, 800, 64))
    Main.main(Array("--images", s"snap:$table", "--labels", "synth:1500",
      "--out", out, "--resume"))
    assert(pinnedId === "1", "resume must reuse the pin")
    assert(spark.read.parquet(out).count() === n1)
    val m = spark.read.parquet(s"${out}_lineage_metrics")
      .orderBy("run_at_ms").collect()
    assert(m.length === 2 && m(1).getAs[Long]("buckets_completed") === 0L)

    // a FRESH run re-pins to the current head and processes the append
    Main.main(Array("--images", s"snap:$table", "--labels", "synth:1500",
      "--out", out))
    assert(pinnedId === "2", "fresh run must re-pin to the new head")
    assert(spark.read.parquet(s"${out}_lineage_metrics").count() === 1)
  }

  test("--quality: decision stage drops flagged images with attributable reasons") {
    import spark.implicits._
    val imgs = sources.SynthImages.images(spark, 600, 8).drop("ts")
    val verdicts = ops.ImageQuality.classify(imgs)
    val keep = verdicts.where(col("keep")).count()
    val drop = verdicts.where(!col("keep")).count()
    assert(keep > 0 && drop > 0, s"thresholds don't split: keep=$keep drop=$drop")
    // the Main wiring: left-semi on kept ids preserves exactly the keepers
    val kept = imgs.join(verdicts.where(col("keep")).select("image_id"),
      Seq("image_id"), "left_semi")
    assert(kept.count() === keep)
    // every dropped row names at least one rule
    assert(verdicts.where(!col("keep") && length(col("reasons")) === 0).count() === 0)
    assert(Main.parseArgs(List("--quality"), Map.empty) === Map("quality" -> "true"))
  }

  test("--limit/--exclude: corpus subsetting by id list before the pipeline") {
    import spark.implicits._
    val imgs = sources.SynthImages.images(spark, 300, 8)
    val allIds = imgs.select("image_id").as[String].collect().sorted

    // --limit as an inline list: only the listed ids survive (left_semi);
    // unknown ids are simply absent, not an error (musif semantics)
    val keep = allIds.take(5) :+ "img_not_in_corpus"
    val limited = Main.corpusSubset(spark, imgs, Some(keep.mkString(",")), None)
    assert(limited.select("image_id").as[String].collect().sorted
      === allIds.take(5))

    // --exclude as an @file: the listed ids are gone, everything else stays
    val f = Files.createTempFile("graft-exclude", ".txt")
    Files.writeString(f, (allIds.take(3) :+ "").mkString("\n")) // blank line ignored
    val excluded = Main.corpusSubset(spark, imgs, None, Some(s"@$f"))
    assert(excluded.count() === allIds.length - 3)
    assert(excluded.where(col("image_id").isin(allIds.take(3): _*)).count() === 0)

    // both flags compose: limit first, then exclude within the kept set
    val both = Main.corpusSubset(spark, imgs,
      Some(allIds.take(5).mkString(",")), Some(allIds.take(2).mkString(",")))
    assert(both.select("image_id").as[String].collect().sorted
      === allIds.slice(2, 5))

    assert(Main.parseArgs(List("--limit", "a,b", "--exclude", "@ids.txt"), Map.empty)
      === Map("limit" -> "a,b", "exclude" -> "@ids.txt"))
  }

  test("--dedup: flag validated at parse time, before any work runs") {
    intercept[IllegalArgumentException](Main.parseArgs(List("--dedup", "lots"), Map.empty))
    intercept[IllegalArgumentException](Main.parseArgs(List("--dedup", "4"), Map.empty))
    intercept[IllegalArgumentException](Main.parseArgs(List("--dedup", "-1"), Map.empty))
    assert(Main.parseArgs(List("--dedup", " 3 "), Map.empty) === Map("dedup" -> "3"))
  }

  test("--split CLI plumbing: parseArgs routes the flag, parseSplitArg parses weights") {
    assert(Main.parseArgs(List("--split", "train:0.8,val:0.1,test:0.1"), Map.empty)
      === Map("split" -> "train:0.8,val:0.1,test:0.1"))
    assert(Main.parseSplitArg("train:0.8,val:0.1,test:0.1")
      === Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    intercept[IllegalArgumentException](Main.parseSplitArg("train=0.8"))
    intercept[NumberFormatException](Main.parseSplitArg("train:lots"))
  }

  test("--split: per-entity training split — all windows of an entity share one label") {
    val cfg = pipeline.GraftConfig()
    val images = sources.SynthImages.images(spark, 1500, 16)
    val labels = sources.SynthImages.labels(spark, 1500, 16)
    val weights = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val feats = ops.Sampling.hashSplit(
      pipeline.FeaturePipeline.features(images, labels, cfg),
      col("entity"), weights)
    val byEntity = feats.groupBy("entity")
      .agg(countDistinct(col("split")).as("n_splits"),
        first(col("split")).as("split"))
      .collect()
    assert(byEntity.nonEmpty)
    // entity-level split: no entity straddles the train/eval boundary
    assert(byEntity.forall(_.getLong(1) === 1L))
    assert(byEntity.map(_.getString(2)).toSet.subsetOf(Set("train", "val", "test")))
    // deterministic: same assignment on recompute
    val again = ops.Sampling.hashSplit(
      pipeline.FeaturePipeline.features(images, labels, cfg),
      col("entity"), weights)
      .groupBy("entity").agg(first(col("split")).as("split")).collect()
      .map(r => r.get(0) -> r.getString(1)).toMap
    byEntity.foreach(r => assert(again(r.get(0)) === r.getString(2)))
  }

  test("auto max_nan_rows adapts to output null density (musif __main__ analog)") {
    import spark.implicits._
    val cfg = pipeline.GraftConfig().withOverrides(Map("max_null_row_ratio" -> "auto"))
    assert(cfg.maxNullRowRatio < 0) // the AUTO sentinel

    // dense-enough table (cols-without-null / rows >= 0.1) -> threshold 1.0
    val dense = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    assert(pipeline.PostProcessor.adaptiveMaxNanRows(dense) === 1.0)

    // long sparse table: 1 null-free column / 100 rows = 0.01 < 0.1 ->
    // threshold = (1/0.99) * q99(per-row null count) / n_cols. Per-row null
    // counts: 99 rows with 1 null (b), one row with 2 (a+b) -> pandas-style
    // interpolated q99 = 1.01 over 3 columns
    val sparse = (1 to 100)
      .map(i => (i, if (i == 100) null else "x", null: String))
      .toDF("k", "a", "b")
    val got = pipeline.PostProcessor.adaptiveMaxNanRows(sparse)
    val q99 = 1.01 // 99th percentile (interpolated) of 99x[1] + 1x[2]
    assert(math.abs(got - (1.0 / 0.99) * q99 / 3) < 1e-9, s"got $got")

    // wired through the job's threshold selection: an adaptive threshold
    // below 1.0 actually drops the outlier-null rows
    val filtered = pipeline.PostProcessor.dropHighNullRows(sparse, got)
    assert(filtered.count() === 99) // only the 2-null row exceeds 1.01/3
  }

  test("CSV sink round-trips the feature table exactly (S6)") {
    val tmp = Files.createTempDirectory("graft-csv").toString
    val feats = pipeline.FeaturePipeline.runSynthetic(spark, 800, 8)
    sources.CsvSink.write(feats, s"$tmp/csv")
    val back = sources.CsvSink.read(spark, s"$tmp/csv", feats.schema)
    // CSV read-back is always nullable — compare names + types
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      feats.schema.map(f => (f.name, f.dataType)))
    assertSameRows(feats, back)
  }

  test("--admin: delete-keys + compact + expire run as one maintenance pass") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-main-admin").toString
    val table = s"$tmp/corpus"
    sources.SnapshotTable.append(spark,
      table, spark.range(0, 200).withColumn("v", col("id") * 2))
    sources.SnapshotTable.append(spark,
      table, spark.range(200, 300).withColumn("v", col("id") * 2))
    val takedown = s"$tmp/takedown"
    spark.range(0, 50).toDF("id").write.parquet(takedown)

    Main.main(Array("--admin", table,
      "--delete-keys", s"id=$takedown", "--compact", "--expire", "1"))

    // one maintenance pass: the takedown applied, the rewrite consumed the
    // tombstones, retention GC'd everything older than the compacted head
    val head = sources.SnapshotTable.snapshot(table,
      sources.SnapshotTable.currentSnapshotId(table).get)
    assert(head.operation === "replace" && head.deletes.isEmpty)
    assert(sources.SnapshotTable.read(spark, table).count() === 250L)
    assert(sources.SnapshotTable.snapshotIds(table) === Seq(head.id))

    // verbs are validated at parse time, before any table is touched
    intercept[IllegalArgumentException] {
      Main.main(Array("--admin", table, "--expire", "0"))
    }
    intercept[IllegalArgumentException] {
      Main.main(Array("--admin", table, "--delete-keys", "no-equals-sign"))
    }
    intercept[IllegalArgumentException] {
      Main.main(Array("--admin", table)) // no verb
    }
  }

  test("--admin --tag/--drop-tag: release rotation from the CLI") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-main-tag").toString
    val table = s"$tmp/corpus"
    sources.SnapshotTable.append(spark, table, spark.range(0, 100).toDF("id"))
    Main.main(Array("--admin", table, "--tag", "v1"))
    assert(sources.SnapshotTable.resolveTag(table, "v1") === Some(1L))
    sources.SnapshotTable.overwrite(spark, table,
      spark.range(100, 120).toDF("id"))
    // one invocation rotates the release: publish v2 at the new head,
    // retire v1, reclaim its now-unreferenced data
    Main.main(Array("--admin", table,
      "--tag", "v2", "--drop-tag", "v1", "--expire", "1"))
    assert(sources.SnapshotTable.tags(table) === Map("v2" -> 2L))
    intercept[IllegalArgumentException] {
      sources.SnapshotTable.snapshot(table, 1L)
    }
    assert(sources.SnapshotTable.read(spark, table,
      sources.SnapshotTable.resolveTag(table, "v2")).count() === 20L)
    // --describe is a read-only verb: inspect without mutating
    val headBefore = sources.SnapshotTable.currentSnapshotId(table)
    Main.main(Array("--admin", table, "--describe"))
    assert(sources.SnapshotTable.currentSnapshotId(table) === headBefore)
  }

  test("--admin --rollback/--drop-staged: recovery and audit-discard from the CLI") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-main-rb").toString
    val table = s"$tmp/corpus"
    sources.SnapshotTable.append(spark, table, spark.range(0, 100).toDF("id"))
    sources.SnapshotTable.append(spark, table,
      spark.range(100, 300).toDF("id")) // the bad commit
    Main.main(Array("--admin", table, "--rollback", "1"))
    assert(sources.SnapshotTable.read(spark, table).count() === 100L)
    assert(sources.SnapshotTable.snapshot(table,
      sources.SnapshotTable.currentSnapshotId(table).get).operation === "rollback")
    val sid = sources.SnapshotTable.stageCommit(spark, table,
      spark.range(300, 310).toDF("id"))
    Main.main(Array("--admin", table, "--drop-staged", sid))
    assert(sources.SnapshotTable.stagedIds(table).isEmpty)
    assert(sources.SnapshotTable.read(spark, table).count() === 100L)
    // parse-time validation, before any table is touched
    intercept[IllegalArgumentException] {
      Main.main(Array("--admin", table, "--rollback", "not-a-number"))
    }
    intercept[IllegalArgumentException] {
      Main.main(Array("--admin", table, "--rollback", "0"))
    }
  }

  test("--admin --zorder: the clustered rewrite from the CLI") {
    import org.apache.spark.sql.functions._
    val tmp = Files.createTempDirectory("graft-main-zo").toString
    val table = s"$tmp/corpus"
    sources.SnapshotTable.commit(spark, table,
      spark.range(0, 1000)
        .select((col("id") / 50).cast("long").as("x"),
          pmod(col("id"), lit(50)).as("y"))
        .repartition(4),
      statsCols = Seq("x", "y"))
    Main.main(Array("--admin", table, "--zorder", "x,y,8"))
    val head = sources.SnapshotTable.snapshot(table,
      sources.SnapshotTable.currentSnapshotId(table).get)
    assert(head.operation === "replace" && head.files.size === 8)
    assert(head.files.forall(f => f.stats.exists(_._1 == "x") &&
      f.stats.exists(_._1 == "y")), "both dimensions' stats must ride")
    assert(sources.SnapshotTable.read(spark, table).count() === 1000L)
    intercept[IllegalArgumentException] {
      Main.main(Array("--admin", table, "--zorder", "x,y"))
    }
    intercept[IllegalArgumentException] {
      Main.main(Array("--admin", table, "--zorder", "x,y,0"))
    }
    intercept[IllegalArgumentException] {
      Main.main(Array("--admin", table, "--zorder", "x,y,8", "--compact"))
    }
  }

  test("--admin --retract-state: a takedown cascades into the dedup state") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-main-retract").toString
    val (table, state) = (s"$tmp/corpus", s"$tmp/state")
    // a 3-member identical-hash cluster {0,1,2} plus a singleton 9
    val corpus = Seq((0L, 0xF0L), (1L, 0xF0L), (2L, 0xF0L), (9L, 0x0FL))
      .toDF("id", "h")
    sources.SnapshotTable.append(spark, table, corpus)
    val cfg = pipeline.IncrementalDedup.Config(
      "id", "h", maxHamming = 1, broadcastSizes = true)
    pipeline.IncrementalDedup.processNew(spark, table, state,
      s"$tmp/cursor.txt", cfg)(identity)
    val takedown = s"$tmp/takedown"
    Seq(0L).toDF("id").write.parquet(takedown)

    Main.main(Array("--admin", table,
      "--delete-keys", s"id=$takedown", "--retract-state", state))

    // corpus and derived state agree after the cascade: id 0 gone from
    // both, the cluster re-labels to its surviving min id
    assert(sources.SnapshotTable.read(spark, table)
      .where(col("id") === 0L).isEmpty)
    val labels = pipeline.IncrementalDedup.currentLabels(spark, state, cfg)
    assert(labels.count() === 3)
    assert(labels.where(col("id") === 1L).select("rep").as[Long].head() === 1L)
    assert(labels.where(col("id") === 2L).select("rep").as[Long].head() === 1L)

    // --retract-state without the takedown keys is refused up front
    intercept[IllegalArgumentException] {
      Main.main(Array("--admin", table, "--compact", "--retract-state", state))
    }
  }
}
