package graft

import org.apache.spark.sql.SparkSession
import graft.pipeline._
import scala.jdk.CollectionConverters._

/** The spark-submit entry point (north rule: "the same spark-submit job must
  * run on multi-executor clusters at N and 4N executors"):
  *
  *   spark-submit --class graft.Main \
  *     --conf spark.sql.extensions=graft.GraftExtensions \
  *     musifspark.jar \
  *     --images <dir|synth:N> --labels <dir|synth:N> --out <dir> \
  *     [--config <properties>] [--set k=v ...] [--resume] \
  *     [--format csv] [--sliding <size>,<overlap>]
  *     [--split train:0.8,val:0.1,test:0.1] [--dedup <maxHamming>] [--quality]
  *     [--limit id1,id2,...|@file] [--exclude id1,id2,...|@file]
  *
  * Table-admin mode (SnapshotTable maintenance — the scheduled
  * takedown/compaction/retention loop; verbs compose in this order):
  *
  *   spark-submit --class graft.Main musifspark.jar \
  *     --admin <tableDir> [--describe] [--delete-keys col=<parquetOfKeys>] \
  *     [--retract-state <stateDir>] [--rollback <snapshotId>] [--compact] \
  *     [--zorder colA,colB,nFiles] [--tag <name>] [--drop-tag <name>] \
  *     [--drop-staged <stagingId>] [--expire <keepLast>]
  *
  * Reads the image+caption table (any Spark source — parquet in the
  * sandbox, an Iceberg catalog table in production via
  * `spark.read.table(...)`), validates rows through the error channel,
  * extracts per-(entity, window) feature vectors, post-processes, and
  * writes output + per-partition lineage. With `--resume`, buckets already
  * present in the lineage table are skipped (anti-join) — a killed run
  * continues without recomputing completed partitions. Over a `snap:`
  * images source the resume additionally re-reads the SNAPSHOT the first
  * run pinned (`<out>_lineage.pin`), so ingest that landed between the
  * crash and the resume never leaks into the resumed run.
  */
object Main {

  def main(args: Array[String]): Unit = {
    val opts = parseArgs(args.toList, Map.empty)
    // spark-submit sets spark.master before main; under a bare `sbt
    // runMain` smoke it is absent, so fall back to local mode
    // (SPARK_GRAFT_MASTER overrides the core count)
    val builder = SparkSession.builder().appName("musifspark")
    // a pre-existing session (spec-driven invocation) is borrowed, not
    // owned: skip the final stop so the suite's shared session survives
    val hadSession = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession).isDefined
    val spark = (if (sys.props.contains("spark.master")) builder
      else builder.master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]")))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cfg = GraftConfig.load(
      opts.get("config"),
      opts.getOrElse("set", "").split(";;").filter(_.contains("="))
        .map { kv => val Array(k, v) = kv.split("=", 2); k -> v }.toMap)

    // table-admin mode: maintenance verbs against a SnapshotTable, the
    // spark-submit surface for the takedown/compaction/retention loop a
    // long-lived corpus runs on a schedule (Iceberg's delete +
    // rewrite_data_files + expire_snapshots procedures). Verbs compose in
    // the order delete -> compact -> expire: a takedown followed by the
    // rewrite that materializes it and the GC that reclaims the space.
    opts.get("admin").foreach { tableDir =>
      require(opts.contains("deleteKeys") || opts.contains("compact") ||
        opts.contains("expire") || opts.contains("tag") ||
        opts.contains("dropTag") || opts.contains("describe") ||
        opts.contains("rollback") || opts.contains("dropStaged") ||
        opts.contains("zorder"),
        "--admin needs at least one verb: --delete-keys col=<parquet>, " +
          "--rollback <id>, --compact, --zorder colA,colB,nFiles, " +
          "--tag <name>, --drop-tag <name>, --drop-staged <id>, " +
          "--expire <keepLast>, --describe")
      require(!(opts.contains("compact") && opts.contains("zorder")),
        "--compact and --zorder are both full rewrites — run one")
      // --describe runs FIRST: inspect before acting (and again last if
      // combined with mutating verbs, so the output shows the result)
      def describe(): Unit = {
        val snaps = sources.SnapshotTable
          .metadataTable(spark, tableDir, "snapshots")
        println(s"[admin] $tableDir: ${snaps.count()} snapshots")
        snaps.show(20, truncate = false)
        val refs = sources.SnapshotTable.metadataTable(spark, tableDir, "refs")
        if (refs.count() > 0) refs.show(20, truncate = false)
        val dels = sources.SnapshotTable
          .metadataTable(spark, tableDir, "deletes")
        if (dels.count() > 0) {
          println(s"[admin] ${dels.count()} pending tombstone files " +
            "(compact() consumes them)")
          dels.show(20, truncate = false)
        }
        val staged = sources.SnapshotTable
          .metadataTable(spark, tableDir, "staged")
        if (staged.count() > 0) {
          println(s"[admin] ${staged.count()} staged commits awaiting " +
            "audit/publish (publishStaged or --drop-staged)")
          staged.show(20, truncate = false)
        }
      }
      if (opts.contains("describe")) describe()
      require(!opts.contains("retractState") || opts.contains("deleteKeys"),
        "--retract-state cascades a takedown and needs --delete-keys to " +
          "name the keys")
      // --rollback runs FIRST among mutating verbs: recovery from a bad
      // commit precedes any maintenance computed over the head
      opts.get("rollback").foreach { id =>
        val snap = sources.SnapshotTable.rollbackTo(tableDir, id.toLong)
        println(s"[admin] snapshot ${snap.id}: rolled $tableDir back to " +
          s"snapshot $id (${snap.totalRows} rows; metadata-only)")
      }
      opts.get("deleteKeys").foreach { v =>
        val Array(keyCol, src) = v.split("=", 2)
        val keys = spark.read.parquet(src)
        val snap = sources.SnapshotTable.deleteKeys(spark, tableDir, keyCol,
          keys)
        // report THIS takedown's keys (addedAt == snap.id), not the
        // accumulated tombstone total — an operator audits the pass
        println(s"[admin] snapshot ${snap.id}: tombstoned " +
          s"${snap.deletes.filter(_.addedAt == snap.id).map(_.rows).sum} " +
          s"'$keyCol' keys in $tableDir")
        // cascade the same takedown into a derived incremental-dedup state
        // (signature tombstone + edge tombstones on both endpoints) — the
        // GDPR composition q122/q123 oracle, as one CLI invocation
        opts.get("retractState").foreach { stateDir =>
          IncrementalDedup.retract(spark, stateDir, keyCol, keys)
          println(s"[admin] retracted the '$keyCol' keys from dedup state " +
            stateDir)
        }
      }
      if (opts.contains("compact")) {
        val snap = sources.SnapshotTable.compact(spark, tableDir)
        println(s"[admin] snapshot ${snap.id}: compacted $tableDir to " +
          s"${snap.files.size} files / ${snap.totalRows} rows" +
          snap.bucketSpec.map(b => s" (bucket layout ${b.buckets}x${b.bucketCol} kept)")
            .getOrElse(""))
      }
      // --zorder colA,colB,nFiles: the clustered rewrite (compact + sort
      // in one) — consumes tombstones like --compact AND restores
      // two-dimensional manifest file skipping
      opts.get("zorder").foreach { v =>
        val Array(a, b, n) = v.split(",").map(_.trim)
        val snap = sources.SnapshotTable.compactZOrdered(spark, tableDir,
          a, b, n.toInt)
        println(s"[admin] snapshot ${snap.id}: Z-order rewrote $tableDir " +
          s"on ($a, $b) into ${snap.files.size} files / ${snap.totalRows} rows")
      }
      // tag the maintained head BEFORE dropping old names and GC'ing: the
      // release-rotation flow (compact → publish 'vN' → retire 'vN-1' →
      // reclaim) as one invocation
      opts.get("tag").foreach { name =>
        val id = sources.SnapshotTable.createTag(tableDir, name)
        println(s"[admin] tagged snapshot $id of $tableDir as '$name'")
      }
      opts.get("dropTag").foreach { name =>
        val dropped = sources.SnapshotTable.dropTag(tableDir, name)
        println(s"[admin] ${if (dropped) "dropped" else "no such"} " +
          s"tag '$name' on $tableDir")
      }
      opts.get("dropStaged").foreach { sid =>
        val dropped = sources.SnapshotTable.dropStaged(tableDir, sid)
        println(s"[admin] ${if (dropped) "dropped" else "no such"} " +
          s"staged commit '$sid' on $tableDir" +
          (if (dropped) " (its files fall to the next --expire's orphan sweep)"
           else ""))
      }
      opts.get("expire").foreach { keep =>
        val (manifests, files) =
          sources.SnapshotTable.expireSnapshots(tableDir, keep.toInt)
        println(s"[admin] expired $manifests snapshots, " +
          s"removed $files data files from $tableDir")
      }
      // …and again after mutating verbs, so the output shows the result
      val mutated = opts.contains("deleteKeys") || opts.contains("compact") ||
        opts.contains("expire") || opts.contains("tag") ||
        opts.contains("dropTag") || opts.contains("rollback") ||
        opts.contains("dropStaged") || opts.contains("zorder")
      if (opts.contains("describe") && mutated) describe()
      if (!hadSession) spark.stop()
      return
    }

    // ONE on-disk layout for both modes (bucket-partitioned, dynamic
    // overwrite, via runResumable): running once without --resume and later
    // with it must never mix flat and partitioned files in outDir. A fresh
    // (non-resume) run clears previous output/lineage/pins first — before
    // any source is even resolved (the snapshot pin below must not outlive
    // the lineage it belongs to), and before the quality stage writes this
    // run's <out>_dropped manifest (cleanup after would delete it).
    val outDir = opts("out")
    val resume = opts.contains("resume")
    val pinPath = java.nio.file.Paths.get(s"${outDir}_columns.txt")
    if (!resume) {
      deleteRecursively(outDir)
      deleteRecursively(s"${outDir}_lineage")
      deleteRecursively(s"${outDir}_lineage_metrics")
      // a run without --quality must not leave a previous run's drop
      // manifest beside its output — stale attribution is worse than none
      deleteRecursively(s"${outDir}_dropped")
      java.nio.file.Files.deleteIfExists(pinPath)
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(s"${outDir}_lineage.pin"))
    }

    // a bare snap: images source is PINNED across resume (north rule:
    // "resumable from Iceberg snapshot checkpoints"): the first run records
    // the table's current snapshot beside the lineage, --resume re-reads
    // exactly that file list — ingest that landed after the crash cannot
    // leak into the resumed run (it belongs to the NEXT fresh run). An
    // explicit `option:snapshot-id=...` spec is a user-chosen pin and goes
    // through TableSource untouched.
    val imagesSpec = opts("images")
    val rawImages =
      if (imagesSpec.startsWith("snap:"))
        sources.SnapshotTable.read(spark, imagesSpec.stripPrefix("snap:"),
          Some(Lineage.pinSnapshot(imagesSpec.stripPrefix("snap:"),
            s"${outDir}_lineage")))
      else sources.TableSource.load(spark, imagesSpec,
        (s, n) => sources.SynthImages.images(s, n, 1024, 4.0 / 1024))
    val labels = sources.TableSource.load(spark, opts("labels"),
      (s, n) => sources.SynthImages.labels(s, n, 1024))

    val subset = corpusSubset(spark, rawImages, opts.get("limit"), opts.get("exclude"))

    // corrupt-row channel: bad rows to <out>_errors, good rows onward
    val (validated, errors) = sources.ErrorChannel.split(subset, sources.ErrorChannel.imageChecks)
    errors.write.mode("overwrite").parquet(s"${outDir}_errors")

    // --dedup <maxHamming>: perceptual near-dup dedup BEFORE feature
    // extraction — aHash band join -> connected components -> keep one
    // representative per cluster (duplicate images would otherwise weight
    // their entity's feature vectors by copy count). Runs after the error
    // channel so corrupt payloads (which all hash to 0) can't form a
    // giant fake cluster. Deduping the WHOLE corpus (not just remaining
    // buckets) is required on partial resume — representatives must not
    // depend on which buckets already completed — but when the lineage
    // table already covers every bucket the job is a no-op, so the eager
    // connected-components fixpoint is skipped entirely.
    val lineageComplete = opts.contains("resume") &&
      java.nio.file.Files.exists(java.nio.file.Paths.get(s"${outDir}_lineage")) &&
      spark.read.parquet(s"${outDir}_lineage")
        .select("partition_id").distinct().count() >= cfg.lineageBuckets
    val deduped = opts.get("dedup") match {
      case Some(h) if !lineageComplete =>
        val edges = ops.Dedup.perceptualEdges(validated, "image_id", "bytes",
          maxHamming = h.trim.toInt)
        ops.Dedup.dropClusteredDuplicates(validated, "image_id", edges)
      case _ => validated
    }

    // --quality: the image keep/drop decision layer AFTER dedup (dedup
    // first, so a low-quality cluster representative doesn't let its
    // higher-quality copies through). Dropped rows land with their reason
    // lists in <out>_dropped — every exclusion stays attributable.
    val images = if (opts.contains("quality") && !lineageComplete) {
      // persist: the verdict table (id + reasons + keep, tiny) feeds two
      // actions (the _dropped write and the semi-join) — uncached, each
      // would re-run the whole dedup + classification chain
      val verdicts = ops.ImageQuality.classify(deduped)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      verdicts.where(!org.apache.spark.sql.functions.col("keep"))
        .select("image_id", "reasons")
        .write.mode("overwrite").parquet(s"${outDir}_dropped")
      deduped.join(
        verdicts.where(org.apache.spark.sql.functions.col("keep"))
          .select("image_id"),
        Seq("image_id"), "left_semi")
    } else deduped

    // Ratio-based column drops are decided ONCE (first run, whole current
    // dataset) and pinned: a resumed run recomputes ratios over only the
    // remaining buckets, which would write partitions with a different
    // column set into the same outDir (schema drift on read-back).
    val pinned: Option[Seq[String]] =
      if (resume && java.nio.file.Files.exists(pinPath))
        Some(java.nio.file.Files.readAllLines(pinPath).asScala.toSeq.filter(_.nonEmpty))
      else None

    // --split train:0.8,val:0.1,test:0.1 — deterministic per-entity split
    // column (Sampling.hashSplit) appended to the feature output
    val split: Option[Seq[(String, Double)]] = opts.get("split").map(parseSplitArg)
    // musif's native windowed mode from the CLI: --sliding <size>,<overlap>
    // emits one feature row per sliding event-window instead of per time
    // window (extract.py:416-464); lineage then keys on (entity, window_id)
    val sliding: Option[(Int, Int)] = opts.get("sliding").map { v =>
      val Array(sz, ov) = v.split(",").map(_.trim.toInt); (sz, ov)
    }

    val job = (in: org.apache.spark.sql.DataFrame) => {
      val raw = sliding match {
        case Some((sz, ov)) =>
          FeaturePipeline.featuresSliding(in, labels, sz, ov, cfg.modules)
            .withColumnRenamed("window_id", "window_start") // lineage ts key
        case None => FeaturePipeline.features(in, labels, cfg)
      }
      // group_columns analog (musif processor.py:160-172): merge the
      // label-share family into aggregate tonal-function shares, keeping
      // the member columns
      val feats = PostProcessor.groupColumnFamilies(raw, labelShareFamilies(raw.columns.toSeq))
      // negative ratio = AUTO: adapt the threshold to this run's observed
      // null density (musif's __main__ auto-config)
      val rowThreshold =
        if (cfg.maxNullRowRatio < 0) PostProcessor.adaptiveMaxNanRows(feats)
        else cfg.maxNullRowRatio
      val rowFiltered =
        if (rowThreshold < 1.0)
          PostProcessor.dropHighNullRows(feats, rowThreshold)
        else feats
      // optional training split — BY ENTITY, not by row, so every window
      // of an entity lands in the same split (a row-level split would leak
      // seen entities into eval). Applied BEFORE the pinned-column logic:
      // the pin file must capture 'split' so a resumed run that toggles
      // --split fails loudly on the column select instead of silently
      // writing mixed-schema partitions into the same outDir (the exact
      // drift class the pin exists to prevent).
      val withSplit = split match {
        case Some(ws) => ops.Sampling.hashSplit(rowFiltered,
          org.apache.spark.sql.functions.col("entity"), ws)
        case None => rowFiltered
      }
      val kept = pinned match {
        case Some(cols) =>
          withSplit.select(cols.map(org.apache.spark.sql.functions.col): _*)
        case None =>
          val d = PostProcessor.dropHighNullColumns(withSplit, cfg.maxNullColumnRatio,
            protect = Seq("entity", "window_start", "split"))
          java.nio.file.Files.writeString(pinPath, d.columns.mkString("\n"))
          d
      }
      PostProcessor.ordered(kept, Seq("entity", "window_start"))
    }

    val result = Lineage.runResumable(spark, images, "phash", "ts", cfg.lineageBuckets,
      outDir, s"${outDir}_lineage",
      resultEntityCol = Some("entity"),
      resultTsCol = Some("window_start")) { remaining => job(remaining) }
    // S6: CSV export through the same writer API (musif's to_csv analog)
    if (opts.get("format").contains("csv"))
      sources.CsvSink.write(result, s"${outDir}_csv")
    println(s"[graft] features -> $outDir (+_lineage, +_errors)")
    if (!hadSession) spark.stop()
  }

  /** The flagship table's family grouping: per-label share columns roll up
    * by chord quality (the analog of musif's Key_* -> SD/T/rel families). */
  def labelShareFamilies(columns: Seq[String]): Seq[PostProcessor.ColumnFamily] = {
    def byQuality(q: String) = columns.filter(c =>
      c.startsWith("label_share_") && c.endsWith(s"_$q")).sorted
    Seq(
      PostProcessor.ColumnFamily("label_share_major", byQuality("maj")),
      PostProcessor.ColumnFamily("label_share_minor", byQuality("min")),
      PostProcessor.ColumnFamily("label_share_dim", byQuality("dim")))
  }

  /** musif's limit_files/exclude_files corpus subsetting
    * (/root/reference/musif/extract/extract.py:184-189): id (file-stem
    * analog) lists applied BEFORE any other processing — `--limit` keeps
    * only listed image_ids (left_semi), `--exclude` drops them (left_anti).
    * A spec is either a comma-separated id list or `@path` to a file with
    * one id per line. The list is user-supplied and never corpus-sized, so
    * both joins broadcast (no corpus shuffle). */
  private[graft] def corpusSubset(spark: SparkSession,
                                  df: org.apache.spark.sql.DataFrame,
                                  limit: Option[String],
                                  exclude: Option[String]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    def idList(spec: String): org.apache.spark.sql.DataFrame = {
      import spark.implicits._
      val ids =
        if (spec.startsWith("@"))
          java.nio.file.Files.readAllLines(java.nio.file.Paths.get(spec.drop(1)))
            .asScala.toSeq.map(_.trim).filter(_.nonEmpty)
        else spec.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
      ids.toDF("image_id")
    }
    val limited = limit match {
      case Some(s) => df.join(broadcast(idList(s)), Seq("image_id"), "left_semi")
      case None => df
    }
    exclude match {
      case Some(s) => limited.join(broadcast(idList(s)), Seq("image_id"), "left_anti")
      case None => limited
    }
  }

  private def deleteRecursively(dir: String): Unit = {
    val p = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(p)) {
      java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.deleteIfExists(f))
    }
  }

  private[graft] def parseSplitArg(v: String): Seq[(String, Double)] =
    v.split(",").toSeq.map { p =>
      val kv = p.split(":")
      require(kv.length == 2, s"--split expects label:weight, got '$p'")
      (kv(0), kv(1).toDouble)
    }

  @annotation.tailrec
  private[graft] def parseArgs(args: List[String], acc: Map[String, String]): Map[String, String] =
    args match {
      case "--images" :: v :: rest => parseArgs(rest, acc + ("images" -> v))
      case "--labels" :: v :: rest => parseArgs(rest, acc + ("labels" -> v))
      case "--out" :: v :: rest    => parseArgs(rest, acc + ("out" -> v))
      case "--config" :: v :: rest => parseArgs(rest, acc + ("config" -> v))
      case "--format" :: v :: rest => parseArgs(rest, acc + ("format" -> v))
      case "--sliding" :: v :: rest => parseArgs(rest, acc + ("sliding" -> v))
      case "--split" :: v :: rest  => parseArgs(rest, acc + ("split" -> v))
      case "--dedup" :: v :: rest  =>
        // validated at parse time: a bad value must fail with a usage
        // message BEFORE the error-channel write runs, not as a raw
        // NumberFormatException (or a require deep inside the band join)
        // after output has already been produced
        val h = try v.trim.toInt catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"--dedup expects an integer hamming radius in 0..3, got '$v'")
        }
        require(h >= 0 && h <= 3,
          s"--dedup expects 0..3 (the 4-band LSH recall bound), got $h")
        parseArgs(rest, acc + ("dedup" -> h.toString))
      case "--admin" :: v :: rest  => parseArgs(rest, acc + ("admin" -> v))
      case "--delete-keys" :: v :: rest =>
        require(v.contains("=") && !v.startsWith("="),
          s"--delete-keys expects <keyCol>=<parquet-of-keys>, got '$v'")
        parseArgs(rest, acc + ("deleteKeys" -> v))
      case "--retract-state" :: v :: rest =>
        require(v.nonEmpty && !v.startsWith("--"),
          s"--retract-state expects an IncrementalDedup state dir, got '$v'")
        parseArgs(rest, acc + ("retractState" -> v))
      case "--rollback" :: v :: rest =>
        val id = try v.trim.toLong catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"--rollback expects a snapshot id, got '$v'")
        }
        require(id >= 1, s"--rollback expects a snapshot id >= 1, got $id")
        parseArgs(rest, acc + ("rollback" -> id.toString))
      case "--drop-staged" :: v :: rest =>
        require(v.nonEmpty && !v.startsWith("--"),
          s"--drop-staged expects a staging id, got '$v'")
        parseArgs(rest, acc + ("dropStaged" -> v))
      case "--tag" :: v :: rest =>
        require(v.nonEmpty && !v.startsWith("--"),
          s"--tag expects a release name, got '$v'")
        parseArgs(rest, acc + ("tag" -> v))
      case "--drop-tag" :: v :: rest =>
        require(v.nonEmpty && !v.startsWith("--"),
          s"--drop-tag expects a tag name, got '$v'")
        parseArgs(rest, acc + ("dropTag" -> v))
      case "--describe" :: rest    => parseArgs(rest, acc + ("describe" -> "true"))
      case "--compact" :: rest     => parseArgs(rest, acc + ("compact" -> "true"))
      case "--zorder" :: v :: rest =>
        val parts = v.split(",").map(_.trim)
        require(parts.length == 3 && parts.forall(_.nonEmpty),
          s"--zorder expects colA,colB,nFiles, got '$v'")
        val n = try parts(2).toInt catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"--zorder expects a file count as its third part, got '${parts(2)}'")
        }
        require(n >= 1, s"--zorder needs nFiles >= 1, got $n")
        // store the NORMALIZED triple so the execution site's re-split
        // can't diverge from what was validated here
        parseArgs(rest, acc + ("zorder" -> parts.mkString(",")))
      case "--expire" :: v :: rest =>
        val n = try v.trim.toInt catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"--expire expects the number of snapshots to retain (>=1), got '$v'")
        }
        require(n >= 1, s"--expire must retain at least the current snapshot, got $n")
        parseArgs(rest, acc + ("expire" -> n.toString))
      case "--limit" :: v :: rest  => parseArgs(rest, acc + ("limit" -> v))
      case "--exclude" :: v :: rest => parseArgs(rest, acc + ("exclude" -> v))
      case "--quality" :: rest     => parseArgs(rest, acc + ("quality" -> "true"))
      case "--set" :: v :: rest =>
        parseArgs(rest, acc + ("set" -> (acc.get("set").map(_ + ";;").getOrElse("") + v)))
      case "--resume" :: rest      => parseArgs(rest, acc + ("resume" -> "true"))
      case Nil => acc
      case other :: _ => throw new IllegalArgumentException(s"unknown arg: $other")
    }
}
