package graft.pipeline

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Checkpoint/resume with per-partition lineage (north rule): the entity
  * space is bucketed into `nBuckets` deterministic partitions; each
  * completed bucket writes a lineage row `(partition_id, row_count, min_ts,
  * max_ts, digest)`. A killed run resumes by anti-joining the input against
  * completed lineage partitions — no recomputation of finished buckets.
  *
  * The digest is order-independent (sum + xor of per-row xxhash64) so it is
  * stable under any task scheduling / parallelism.
  *
  * Reference semantics: musif's per-score pickle cache + "skip already
  * extracted files" resume (`/root/reference/musif/extract/extract.py:559-575`,
  * `/root/reference/run_extraction_example.py:31-37`) — re-expressed as
  * partition-level bookkeeping instead of per-file memoization.
  */
object Lineage {

  /** Per-row hash used for bucket assignment and digests. */
  type RowHasher = Seq[org.apache.spark.sql.Column] => org.apache.spark.sql.Column

  /** Production hasher: native codegen'd xxhash64 (fast, binary-exact on
    * every type, no string round-trip). */
  val xxHasher: RowHasher = cols => xxhash64(cols: _*)

  /** Cross-engine 56-bit hasher for oracle verification: the first 14 hex
    * chars of md5 over the '|'-joined canonical string, parsed base-16 —
    * DuckDB computes the identical value as
    * `('0x' || substr(md5(concat_ws('|', ...)), 1, 14))::BIGINT`. Only used
    * by the driver-gate query (q73); strings/integers only, since double
    * formatting is not canonical across engines. */
  val md5Hasher56: RowHasher = cols =>
    conv(substring(md5(concat_ws("|", cols: _*)), 1, 14), 16, 10).cast("long")

  def bucketOf(entityCol: String, nBuckets: Int) =
    pmod(xxhash64(col(entityCol)), lit(nBuckets.toLong)).cast("int")

  /** Canonical digest encoding: floating-point columns enter the digest as
    * `round(x * 1e6)::BIGINT` — the same 6-decimal precision every oracled
    * comparison in this repo uses (Q.r6). Two wins over hashing raw IEEE
    * bits: (1) a resumed bucket recomputed at different parallelism can
    * differ from the original by thread-summation-order ulps, and a
    * content fingerprint must NOT flip on sub-1e-6 jitter; (2) the
    * encoding is integer arithmetic both Spark and DuckDB express
    * identically, so the digest is cross-engine replayable (q56/q73).
    * Non-float columns pass through untouched. */
  def digestEncode(dt: org.apache.spark.sql.types.DataType,
                   c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    dt match {
      case org.apache.spark.sql.types.DoubleType |
           org.apache.spark.sql.types.FloatType =>
        round(c * lit(1e6)).cast("long")
      case _ => c
    }

  /** Lineage rows for a result DataFrame (one per non-empty bucket). */
  def compute(df: DataFrame, entityCol: String, tsCol: String,
              nBuckets: Int, hasher: RowHasher = xxHasher): DataFrame = {
    val hashCols = df.schema.fields.toSeq.map(f =>
      digestEncode(f.dataType, col(f.name)))
    df.groupBy(pmod(hasher(Seq(col(entityCol))), lit(nBuckets.toLong))
        .cast("int").as("partition_id"))
      .agg(
        count(lit(1)).as("row_count"),
        min(col(tsCol)).as("min_ts"),
        max(col(tsCol)).as("max_ts"),
        // order-independent content digest: xor of row hashes (duplicate
        // rows cancel) combined with a bounded modular sum (catches them);
        // both are overflow-safe under ANSI at any row count
        call_function("bit_xor", hasher(hashCols))
          .bitwiseXOR(sum(pmod(hasher(hashCols), lit(1000003L)))).as("digest"))
  }

  /** Run `job` over `input` bucket-incrementally with resume:
    * buckets already present in the lineage table at `lineageDir` are
    * skipped (anti-join). Output is written partitioned by bucket with
    * DYNAMIC partition overwrite, which makes a resumed run idempotent: if
    * a previous run died after writing output but before recording lineage,
    * the recomputed buckets REPLACE their partitions instead of duplicating
    * rows. Lineage digests are computed from a read-back of the data
    * actually written (not a second execution of the job), so the recorded
    * digest always matches the files on disk.
    *
    * Each run additionally appends ONE metrics row to
    * `<lineageDir>_metrics` — `(run_at_ms, run_at, buckets_completed,
    * buckets_skipped, rows_written, wall_ms)` — so a resumed job's
    * progress is auditable from the lineage tables alone (order runs by
    * `run_at_ms`).
    */
  def runResumable(
      spark: SparkSession,
      input: DataFrame,
      entityCol: String,
      tsCol: String,
      nBuckets: Int,
      outDir: String,
      lineageDir: String,
      resultEntityCol: Option[String] = None,
      resultTsCol: Option[String] = None)(job: DataFrame => DataFrame): DataFrame = {
    val t0 = System.nanoTime()
    // the job may rename the entity/ts columns in its output (e.g. phash ->
    // entity); bucket ids stay aligned because the VALUES are unchanged
    val outEntity = resultEntityCol.getOrElse(entityCol)
    val outTs = resultTsCol.getOrElse(tsCol)

    // refuse a pre-existing FLAT (unpartitioned) output layout: dynamic
    // partition overwrite would leave the flat files in place and the
    // read-back would double-count rows / mix schemas
    val outPath = Paths.get(outDir)
    if (Files.isDirectory(outPath)) {
      // Files.list returns a stream backed by an open directory handle —
      // close it even on the require() throw
      val listing = Files.list(outPath)
      val hasFlatData =
        try {
          val flat = listing.iterator()
          Iterator.continually(flat)
            .takeWhile(_.hasNext).map(_.next())
            .exists(p => p.getFileName.toString.endsWith(".parquet"))
        } finally listing.close()
      require(!hasFlatData,
        s"$outDir holds unpartitioned parquet (no __bucket= dirs); resuming " +
          "over a flat layout would double-count rows — clear it or use a fresh dir")
    }

    val withBucket = input.withColumn("__bucket", bucketOf(entityCol, nBuckets))
    val done: DataFrame =
      if (Files.exists(Paths.get(lineageDir)))
        spark.read.parquet(lineageDir).select(col("partition_id").as("__bucket"))
      else spark.range(0).select(col("id").cast("int").as("__bucket"))

    val remaining = withBucket.join(broadcast(done), Seq("__bucket"), "left_anti")
      .drop("__bucket")

    val result = job(remaining)
      .withColumn("__bucket", bucketOf(outEntity, nBuckets))
    result.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__bucket")
      .parquet(outDir)

    // lineage from the written files, restricted to this run's buckets
    val written = spark.read.parquet(outDir)
    val freshBuckets = written.select(col("__bucket"))
      .join(broadcast(done), Seq("__bucket"), "left_anti").distinct()
    val lineage = compute(
      written.join(broadcast(freshBuckets), Seq("__bucket"), "left_semi")
        .drop("__bucket"), outEntity, outTs, nBuckets)
    // <= nBuckets rows — collected once so the lineage append and the
    // metrics row are derived from the SAME materialized values
    val lineageRows = lineage.collect()
    spark.createDataFrame(
        java.util.Arrays.asList(lineageRows: _*), lineage.schema)
      .coalesce(1).write.mode("append").parquet(lineageDir)

    // per-run METRICS row beside the lineage table (north rule: "lineage +
    // metrics"): what this run did and how long it took — enough for an
    // operator to audit a resumed job's progress without re-scanning output
    {
      import spark.implicits._
      val priorBuckets = done.distinct().count()
      // run_at_ms is the ordering key: Instant.toString has VARIABLE
      // fractional precision ("..T10:00:00Z" vs "..T10:00:00.400Z"), so
      // lexicographic order can disagree with chronological order right at
      // second boundaries — the ISO string is display-only
      Seq((System.currentTimeMillis(),
          java.time.Instant.now().toString,
          lineageRows.length.toLong,
          priorBuckets,
          lineageRows.map(_.getAs[Long]("row_count")).sum,
          (System.nanoTime() - t0) / 1000000L))
        .toDF("run_at_ms", "run_at", "buckets_completed", "buckets_skipped",
          "rows_written", "wall_ms")
        .coalesce(1).write.mode("append").parquet(s"${lineageDir}_metrics")
    }
    written.drop("__bucket")
  }

  /** [[runResumable]] over a [[graft.sources.SnapshotTable]], with the
    * snapshot PINNED across the job's whole lifetime — the north rule's
    * "resumable from Iceberg snapshot checkpoints": the first run resolves
    * the table's current snapshot and durably records it beside the lineage
    * table (`<lineageDir>.pin`, atomic first-writer-wins publish); every
    * resume re-reads that pin and scans exactly the same file list, so
    * commits that landed between the crash and the resume can NOT leak rows
    * into the resumed run. Completed-bucket skipping, idempotent dynamic
    * partition overwrite and per-run metrics are inherited from
    * [[runResumable]] unchanged.
    *
    * Returns the pinned snapshot id with the output, so callers can record
    * "which table version produced these features" in their own metadata
    * and run [[graft.sources.SnapshotTable.changes]] from it later.
    */
  def runResumableSnapshot(
      spark: SparkSession,
      tableDir: String,
      entityCol: String,
      tsCol: String,
      nBuckets: Int,
      outDir: String,
      lineageDir: String,
      resultEntityCol: Option[String] = None,
      resultTsCol: Option[String] = None)(job: DataFrame => DataFrame): (Long, DataFrame) = {
    val pinned = pinSnapshot(tableDir, lineageDir)
    val input = graft.sources.SnapshotTable.read(spark, tableDir, Some(pinned))
    val out = runResumable(spark, input, entityCol, tsCol, nBuckets, outDir,
      lineageDir, resultEntityCol, resultTsCol)(job)
    (pinned, out)
  }

  /** Resolve-once snapshot pin: reads `<lineageDir>.pin` if present, else
    * publishes the table's current snapshot id there atomically (CREATE_NEW
    * move — under a concurrent duplicate launch exactly one pin wins and
    * both runs read it back, so they agree on the snapshot).
    *
    * The pin records WHICH table it pins (canonical table path, first
    * line) alongside the id: a `--resume` that reuses the same `--out`
    * against a DIFFERENT snapshot table would otherwise apply the previous
    * run's pin id to the new table — silently reading the wrong snapshot
    * whenever that id happens to exist there. Mismatch fails loudly. */
  private[graft] def pinSnapshot(tableDir: String, lineageDir: String): Long = {
    val pinPath = Paths.get(lineageDir + ".pin")
    val canonical = Paths.get(tableDir).toAbsolutePath.normalize.toString
    if (!Files.exists(pinPath)) {
      val head = graft.sources.SnapshotTable.currentSnapshotId(tableDir)
        .getOrElse(sys.error(s"$tableDir has no snapshots to pin"))
      // a relative single-segment lineage path has a null parent — stage
      // the pin in the working directory then (the writeCursor convention)
      val parent = Option(pinPath.getParent).getOrElse(Paths.get("."))
      Files.createDirectories(parent)
      val tmp = Files.createTempFile(parent, ".pin-staging", ".txt")
      Files.write(tmp, s"$canonical\n$head\n".getBytes("UTF-8"))
      // link(2) is the atomic fail-if-exists publish (a rename would
      // silently replace a concurrent launch's pin); losing means the
      // other launch's pin stands and both runs read the same snapshot
      try Files.createLink(pinPath, tmp)
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
      finally Files.deleteIfExists(tmp)
    }
    val lines = new String(Files.readAllBytes(pinPath), "UTF-8")
      .linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
    require(lines.length == 2, s"$pinPath is not a table:snapshot pin " +
      s"(${lines.length} lines) — a pre-table-binding pin or a corrupt file; " +
      "delete it to re-pin the table head")
    require(lines.head == canonical,
      s"$pinPath pins table ${lines.head}, but this run reads $canonical — " +
        "refusing to apply a foreign pin id; use a fresh lineage dir (or " +
        "delete the pin if the table genuinely moved)")
    lines(1).toLong
  }
}
