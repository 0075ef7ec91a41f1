package graft.sources

import graft.SparkSpec
import graft.functions.ZOrder
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Sort- and Z-order-clustered compaction: the rewrite_data_files-with-
  * sort-order analogs that restore manifest file skipping after an
  * out-of-order ingest. */
class SnapshotClusterSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("graft-cluster").toString

  /** Straight-line Morton reference: bit i of a -> bit 2i, of b -> 2i+1. */
  private def mortonRef(a: Long, b: Long): Long = {
    var r = 0L
    var i = 0
    while (i < 16) {
      r |= ((a >> i) & 1L) << (2 * i)
      r |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    r
  }

  test("ZOrder.morton matches the straight-line bit-interleave reference") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(500)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val df = pairs.toDF("a", "b")
      .withColumn("z", ZOrder.morton(col("a"), col("b")))
    df.collect().foreach { r =>
      assert(r.getAs[Long]("z") === mortonRef(r.getAs[Long]("a"), r.getAs[Long]("b")),
        s"morton(${r.getAs[Long]("a")}, ${r.getAs[Long]("b")})")
    }
    // adjacency sanity: the curve's first cells walk the 2x2 blocks
    assert(mortonRef(0, 0) === 0L && mortonRef(1, 0) === 1L &&
      mortonRef(0, 1) === 2L && mortonRef(1, 1) === 3L)
  }

  test("normalize16 is monotone and spans the full domain") {
    val vals = Seq(0L, 1L, 499L, 500L, 999L, 1000L).toDF("v")
      .withColumn("n", ZOrder.normalize16(col("v"), 0L, 1000L))
      .collect().map(_.getAs[Long]("n")).toSeq
    assert(vals === vals.sorted, "monotone")
    assert(vals.head === 0L && vals.last === 65535L)
    // degenerate range: everything maps to 0, no division by zero
    val deg = Seq(5L).toDF("v")
      .withColumn("n", ZOrder.normalize16(col("v"), 5L, 5L))
      .collect().head.getAs[Long]("n")
    assert(deg === 0L)
    // overflow regimes: a huge span (multiply would wrap) and a span that
    // itself overflows a signed long (full-range hash column) must both
    // stay monotone inside [0, 65535] — a silent wrap would scramble the
    // Morton order and quietly defeat pruning
    def probe(mn: Long, mx: Long): Seq[Long] = {
      val vs = Seq(mn, mn / 2, -1L, 0L, 1L, mx / 2, mx)
        .filter(v => v >= mn && v <= mx).distinct.sorted
      val out = vs.toDF("v")
        .withColumn("n", ZOrder.normalize16(col("v"), mn, mx))
        .orderBy("v").collect().map(_.getAs[Long]("n")).toSeq
      assert(out === out.sorted, s"not monotone for [$mn, $mx]: $out")
      assert(out.forall(n => n >= 0L && n <= 65535L),
        s"out of range for [$mn, $mx]: $out")
      out
    }
    val huge = probe(0L, Long.MaxValue / 2) // multiply-then-divide would wrap
    assert(huge.head === 0L && huge.last >= 65534L, s"span not used: $huge")
    val full = probe(Long.MinValue, Long.MaxValue) // span wraps a signed long
    assert(full.head === 0L && full.last >= 65534L, s"span not used: $full")
  }

  test("compactSorted: a fragmented unsorted ingest recovers narrow-range file skipping") {
    val dir = tmpTable()
    // 4 commits, each scattering ids across the WHOLE range -> every
    // file's min/max spans everything, pruning is useless
    (0 until 4).foreach { k =>
      val part = spark.range(0, 8000)
        .where(pmod(col("id"), lit(4)) === k)
        .withColumn("v", col("id") * 2)
        .repartition(4) // random-ish scatter within the commit
      SnapshotTable.commit(spark, dir, part, statsCols = Seq("id"))
    }
    val before = SnapshotTable.snapshot(dir,
      SnapshotTable.currentSnapshotId(dir).get)
    val narrow = Seq(("id", 1000L, 1099L))
    assert(SnapshotTable.prunedFiles(before, narrow).size === before.files.size,
      "pre-rewrite: every file spans the whole range, nothing prunes")
    val expected = SnapshotTable.read(spark, dir)
    val after = SnapshotTable.compactSorted(spark, dir, Seq("id"), targetFiles = 16)
    assert(after.operation === "replace" && after.files.size === 16)
    assert(SnapshotTable.prunedFiles(after, narrow).size <= 2,
      s"post-rewrite a 100/8000 slice must touch <=2 of 16 files, " +
        s"got ${SnapshotTable.prunedFiles(after, narrow).size}")
    assertSameRows(SnapshotTable.read(spark, dir), expected)
    assertSameRows(SnapshotTable.readRange(spark, dir, "id", 1000L, 1099L),
      expected.where(col("id").between(1000, 1099)))
  }

  test("compactZOrdered: box queries prune on BOTH dimensions at once") {
    val dir = tmpTable()
    // a 100x100 grid committed in hash-scrambled order: pre-rewrite every
    // file spans both dimensions entirely
    val grid = spark.range(0, 10000)
      .select((col("id") / 100).cast("long").as("x"),
        pmod(col("id"), lit(100)).as("y"))
      .withColumn("v", col("x") * 1000 + col("y"))
    (0 until 4).foreach { k =>
      SnapshotTable.commit(spark, dir,
        grid.where(pmod(xxhash64(col("x"), col("y")), lit(4)) === k).repartition(4),
        statsCols = Seq("x", "y"))
    }
    val before = SnapshotTable.snapshot(dir,
      SnapshotTable.currentSnapshotId(dir).get)
    val box = Seq(("x", 10L, 34L), ("y", 60L, 84L)) // a 25x25 box = 6.25% of area
    assert(SnapshotTable.prunedFiles(before, box).size === before.files.size)
    val expected = SnapshotTable.read(spark, dir)
    val after = SnapshotTable.compactZOrdered(spark, dir, "x", "y", targetFiles = 16)
    assert(after.operation === "replace" && after.files.size === 16)
    val touched = SnapshotTable.prunedFiles(after, box).size
    assert(touched <= 4,
      s"a 6.25%-area box over a Z-ordered rewrite must touch <=4 of 16 files, got $touched")
    // single-dimension slices prune too (the property a lexicographic
    // sort on x would LOSE for y)
    val ySlice = Seq(("y", 0L, 12L))
    assert(SnapshotTable.prunedFiles(after, ySlice).size < 16,
      "a y-only slice must also skip files")
    assertSameRows(SnapshotTable.read(spark, dir), expected)
    assertSameRows(
      SnapshotTable.readRangeMulti(spark, dir, box),
      expected.where(col("x").between(10, 34) && col("y").between(60, 84)))
  }

  test("compactZOrdered falls back to a plain rewrite when a dimension is all null") {
    val dir = tmpTable()
    SnapshotTable.commit(spark, dir, spark.range(0, 100)
      .select(col("id").as("x"), lit(null).cast("long").as("y"),
        col("id").as("v")).repartition(4))
    val snap = SnapshotTable.compactZOrdered(spark, dir, "x", "y", 4)
    assert(snap.operation === "replace")
    assert(SnapshotTable.read(spark, dir).count() === 100L)
  }

  test("clustered rewrites refuse a bucketed head (its layout IS the clustering)") {
    val dir = tmpTable()
    SnapshotTable.commitBucketed(spark, dir,
      spark.range(0, 100).withColumn("v", col("id")),
      SnapshotTable.BucketSpec(4, "id", Seq("id")))
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.compactSorted(spark, dir, Seq("id"), 4)
    }
    assert(e.getMessage.contains("bucket layout"))
    val e2 = intercept[IllegalArgumentException] {
      SnapshotTable.compactZOrdered(spark, dir, "id", "v", 4)
    }
    assert(e2.getMessage.contains("bucket layout"))
  }
}
