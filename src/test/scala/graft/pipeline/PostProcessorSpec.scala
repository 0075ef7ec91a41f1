package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import PostProcessor._

class PostProcessorSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, Some(1.0), None: Option[Double], Some("x"), "NA"),
    (2L, None, None, Some("y"), "ok"),
    (3L, Some(3.0), None, None, "ok")
  ).toDF("id", "a_score", "b_score", "tag", "status")

  test("dropColumns by predicates") {
    val out = dropColumns(df, ColumnDropSpec(endsWith = Seq("_score"), exact = Seq("status")))
    assert(out.columns.toSeq === Seq("id", "tag"))
    val rx = dropColumns(df, ColumnDropSpec(regex = Seq("^[ab]_")))
    assert(rx.columns.toSeq === Seq("id", "tag", "status"))
  }

  test("nullRatios in one pass; dropHighNullColumns keeps protected keys") {
    val r = nullRatios(df)
    assert(r("b_score") === 1.0 && math.abs(r("a_score") - 1.0 / 3) < 1e-12 && r("id") === 0.0)
    // maxRatio=1.0 == drop only all-null columns
    assert(dropHighNullColumns(df, 1.0).columns.toSeq === Seq("id", "a_score", "tag", "status"))
    // tighter ratio drops a_score and tag too, but id is protected
    val tight = dropHighNullColumns(df, 0.2, protect = Seq("id"))
    assert(tight.columns.toSeq === Seq("id", "status"))
  }

  test("dropHighNullRows") {
    val out = dropHighNullRows(df, 0.4, Seq("a_score", "b_score", "tag"))
    // rows 2 and 3 have 2/3 nulls -> dropped; row 1 has 1/3 -> kept
    assert(out.select("id").collect().map(_.getLong(0)).toSet === Set(1L))
    // looser threshold keeps the 2/3 rows too
    assert(dropHighNullRows(df, 0.7, Seq("a_score", "b_score", "tag")).count() === 3L)
  }

  test("fillNulls only touches matching numeric columns") {
    val out = fillNulls(df, Seq("_score"), 0.0)
    val r2 = out.where(col("id") === 2).collect()(0)
    assert(r2.getAs[Double]("a_score") === 0.0 && r2.getAs[Double]("b_score") === 0.0)
    assert(r2.getAs[String]("tag") === "y") // string column untouched
  }

  test("sentinelToNull recodes NA in string columns only") {
    val out = sentinelToNull(df)
    assert(out.where(col("status").isNull).count() === 1)
  }

  test("ordered: stable row and column order") {
    val out = ordered(df, Seq("id"))
    assert(out.columns.toSeq === Seq("id", "a_score", "b_score", "status", "tag"))
    assert(out.select("id").collect().map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
  }

  test("oneHotExplode: presence columns over a fixed category domain") {
    val df2 = Seq((1L, "ob,vn"), (2L, "vn"), (3L, "")).toDF("id", "instr")
    val out = oneHotExplode(df2, "instr", Seq("ob", "vn", "fl"), prefix = "has_")
      .orderBy("id")
      .select("has_ob", "has_vn", "has_fl")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq
    assert(out === Seq((1, 1, 0), (0, 1, 0), (0, 0, 0)))
  }

  test("resumeMerge: fresh rows win on key") {
    val prev = Seq((1L, "old"), (2L, "old")).toDF("id", "v")
    val fresh = Seq((2L, "new"), (3L, "new")).toDF("id", "v")
    val got = resumeMerge(prev, fresh, Seq("id")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((1L, "old"), (2L, "new"), (3L, "new")))
  }
}
