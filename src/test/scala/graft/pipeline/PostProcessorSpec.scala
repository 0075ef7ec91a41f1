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

  test("dropUnavailable: drops flag==0, keeps null flags, no-op if column absent") {
    val d = Seq((1L, Some(1)), (2L, Some(0)), (3L, None: Option[Int]))
      .toDF("id", "avail")
    assert(dropUnavailable(d, "avail").select("id").collect()
      .map(_.getLong(0)).toSet === Set(1L, 3L))
    assert(dropUnavailable(d, "nope").count() === 3L)
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

  test("groupColumnFamilies: reference Key_ shapes (SD/sd/SubD/T/rel/Other), nulls fillna(0)") {
    // musif's Key_ columns differ only by degree case (IV vs iv) — Spark
    // needs case-sensitive resolution for such a table
    spark.conf.set("spark.sql.caseSensitive", "true")
    try {
    val d = Seq(
      // (IV, II, VI, iv, ii, I, i, III, vi, bV=other, Modulatory_IV=excluded)
      (1L, Some(10.0), Some(5.0), Option.empty[Double], Some(2.0), Some(1.0), Some(20.0),
        Some(4.0), Some(3.0), Some(6.0), Some(7.0), Some(99.0))
    ).toDF("id",
      "Harmony_Key_IV_PercentageMeasures", "Harmony_Key_II_PercentageMeasures",
      "Harmony_Key_VI_PercentageMeasures", "Harmony_Key_iv_PercentageMeasures",
      "Harmony_Key_ii_PercentageMeasures", "Harmony_Key_I_PercentageMeasures",
      "Harmony_Key_i_PercentageMeasures", "Harmony_Key_III_PercentageMeasures",
      "Harmony_Key_vi_PercentageMeasures", "Harmony_Key_bV_PercentageMeasures",
      "Harmony_Key_Modulatory_IV")
    val out = groupColumnFamilies(d, MusifFamilies.keys(d.columns.toSeq))
    val r = out.collect()(0)
    // VI is null -> counts as 0 (reference fillna(0) before the sum)
    assert(r.getAs[Double]("Harmony_Key_SD_PercentageMeasures") === 15.0)
    assert(r.getAs[Double]("Harmony_Key_sd_PercentageMeasures") === 3.0)
    // SubD sums the two TARGETS added earlier in the same pass
    assert(r.getAs[Double]("Harmony_Key_SubD_PercentageMeasures") === 18.0)
    assert(r.getAs[Double]("Harmony_Key_T_PercentageMeasures") === 24.0)
    assert(r.getAs[Double]("Harmony_Key_rel_PercentageMeasures") === 9.0)
    // Other picks up bV but NOT the Modulatory_ column
    assert(r.getAs[Double]("Harmony_Key_Other_PercentageMeasures") === 7.0)
    // member columns are kept (and 0-filled where null)
    assert(r.getAs[Double]("Harmony_Key_VI_PercentageMeasures") === 0.0)
    assert(out.columns.contains("Harmony_Key_IV_PercentageMeasures"))
    } finally spark.conf.set("spark.sql.caseSensitive", "false")
  }

  test("groupColumnFamilies: reference Degree shapes per part prefix") {
    val d = Seq((1L, 1.0, 2.0, 4.0, 8.0, 16.0, 32.0)).toDF("id",
      "PartVnI_Degree1_Count", "PartVnI_Degree2_Count",   // Nat
      "PartVnI_Degree#4_Count",                           // Asc + Nonat
      "PartVnI_Degreeb6_Count",                           // Desc + Nonat
      "PartVnI_Degreebb7_Count",                          // Ddesc (+ Desc? no: 'bb') + Nonat
      "PartObI_Degree1_Count")                            // other part — excluded
    val out = groupColumnFamilies(d,
      MusifFamilies.partDegrees(d.columns.toSeq, "PartVnI_"))
    val r = out.collect()(0)
    assert(r.getAs[Double]("PartVnI_Degree_Asc") === 4.0)
    assert(r.getAs[Double]("PartVnI_Degree_Desc") === 8.0)   // 'b' not 'bb'
    assert(r.getAs[Double]("PartVnI_Degree_Ddesc") === 16.0)
    assert(r.getAs[Double]("PartVnI_Degree_Dasc") === 0.0)   // no 'x' columns
    assert(r.getAs[Double]("PartVnI_Degree_Nat") === 3.0)    // Degree1 + Degree2
    assert(r.getAs[Double]("PartVnI_Degree_Nonat") === 28.0) // #4 + b6 + bb7
  }

  test("groupColumnFamilies wired in Main: label shares roll up by chord quality") {
    val d = Seq((1L, 0.5, 0.25, 0.125, 0.125))
      .toDF("id", "label_share_C_maj", "label_share_G_maj",
        "label_share_A_min", "label_share_B_dim")
    val out = groupColumnFamilies(d, graft.Main.labelShareFamilies(d.columns.toSeq))
    val r = out.collect()(0)
    assert(r.getAs[Double]("label_share_major") === 0.75)
    assert(r.getAs[Double]("label_share_minor") === 0.125)
    assert(r.getAs[Double]("label_share_dim") === 0.125)
  }

  test("resumeMerge: fresh rows win on key") {
    val prev = Seq((1L, "old"), (2L, "old")).toDF("id", "v")
    val fresh = Seq((2L, "new"), (3L, "new")).toDF("id", "v")
    val got = resumeMerge(prev, fresh, Seq("id")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((1L, "old"), (2L, "new"), (3L, "new")))
  }
}
