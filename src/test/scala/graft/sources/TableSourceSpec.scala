package graft.sources

import graft.SparkSpec
import java.nio.file.Files

class TableSourceSpec extends SparkSpec {
  import spark.implicits._

  private def synthFn = (s: org.apache.spark.sql.SparkSession, n: Long) =>
    SynthImages.images(s, n, 4)

  test("spec routing: synth, parquet dir, catalog table") {
    assert(TableSource.load(spark, "synth:50", synthFn).count() === 50L)

    val dir = Files.createTempDirectory("graft-ts").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(s"$dir/t")
    assert(TableSource.load(spark, s"$dir/t", synthFn).count() === 2L)

    Seq((9L, "x")).toDF("id", "v").createOrReplaceTempView("ts_view")
    assert(TableSource.load(spark, "table:ts_view", synthFn).count() === 1L)
  }

  test("alternate formats: csv round-trips CsvSink output; json and orc load") {
    val dir = Files.createTempDirectory("graft-ts-fmt").toString
    val df = Seq((1L, "a", java.sql.Timestamp.valueOf("2024-01-01 00:00:01")),
      (2L, "b", java.sql.Timestamp.valueOf("2024-02-03 04:05:06")))
      .toDF("id", "v", "ts")
    CsvSink.write(df, s"$dir/c")
    val back = TableSource.load(spark, s"csv:$dir/c", synthFn)
    assert(back.count() === 2L)
    assert(back.select("ts").collect().map(_.getTimestamp(0)).toSet ===
      df.select("ts").collect().map(_.getTimestamp(0)).toSet)
    df.write.json(s"$dir/j")
    assert(TableSource.load(spark, s"json:$dir/j", synthFn).count() === 2L)
    df.write.orc(s"$dir/o")
    val orc = TableSource.load(spark, s"orc:$dir/o", synthFn)
    assert(orc.count() === 2L && orc.schema.fieldNames.toSet === Set("id", "v", "ts"))
  }

  test("bucketed: spec re-attaches a writeBucketed layout with metadata intact") {
    val dir = Files.createTempDirectory("graft-ts-bucketed").toString
    val df = (0 until 40).map(i => (i % 4L, i.toLong, s"v$i"))
      .toDF("entity", "ts", "v")
    TableSource.writeBucketed(df, "tsb_src", s"$dir/t", 4,
      "entity", Seq("entity", "ts"))
    spark.sql("DROP TABLE tsb_src") // only the files survive a new session
    val loaded = TableSource.load(spark,
      s"bucketed:$dir/t|4|entity|entity,ts", synthFn)
    assert(loaded.count() === 40L)
    // the scan must report the bucketing (the exchange-free read path)
    val scan = loaded.groupBy("entity").count()
      .queryExecution.executedPlan.toString
    assert(scan.contains("Bucketed: true"), s"bucket metadata lost:\n$scan")
    assert(!scan.contains("Exchange"), s"bucketed agg still shuffles:\n$scan")
  }

  test("option: prefixes are parsed and forwarded without breaking the path") {
    val dir = Files.createTempDirectory("graft-ts2").toString
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$dir/t")
    // mergeSchema is a real parquet reader option; the load must succeed
    val df = TableSource.load(spark, s"option:mergeSchema=true;$dir/t", synthFn)
    assert(df.count() === 1L)
    intercept[IllegalArgumentException](
      TableSource.load(spark, "option:badformat;x", synthFn))
  }

  test("parquetRowCount reads footer metadata: multi-part dirs and single files") {
    val dir = Files.createTempDirectory("graft-ts3").toString
    spark.range(0, 1234).repartition(3).write.parquet(s"$dir/t")
    assert(TableSource.parquetRowCount(spark, s"$dir/t") === 1234L)
    // the driver testdata layout (single .parquet path)
    assert(TableSource.parquetRowCount(spark, "/root/testdata/sf0.001/region.parquet")
      === spark.read.parquet("/root/testdata/sf0.001/region.parquet").count())
  }
}
