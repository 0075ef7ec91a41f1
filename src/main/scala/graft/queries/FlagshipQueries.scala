package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.pipeline.{FeaturePipeline, PostProcessor}
import Q._

/** The flagship musif-analog pipeline (`FeaturesExtractor.extract()`,
  * `/root/reference/musif/extract/extract.py:255-311`) — oracled END TO END
  * in BOTH product modes:
  *
  *  - q55: time-axis mode — prepare -> as-of label join -> lag/sessionize
  *    enrichment -> tumbling-window aggregation -> group_columns families;
  *  - q65: musif's native sliding measure-window mode
  *    (`extract.py:416-464`) — same chain, but rows explode into
  *    size/overlap windows and the order-dependent enrichment is scoped per
  *    (entity, window) exactly like the reference re-extracts each slice.
  *
  * Verify materializes the deterministic synthesized inputs (the
  * prepared-slim table the pipeline shuffles, and the label table) under
  * `<outDir>/__synth/` and substitutes the `__SYNTH_DIR__` placeholder in
  * the oracle SQL with that absolute path, so DuckDB replays the exact same
  * input. Timestamps are exported as epoch SECONDS (the synthesis is
  * whole-second), which sidesteps parquet timestamp-annotation skew between
  * engines while preserving ordering, gap, and window-bucket semantics.
  */
object FlagshipQueries {

  /** `<label> -> label_share_<l>_<q>` column name, as LabelModule emits. */
  private[queries] def shareCol(l: String): String =
    s"label_share_${l.replace(':', '_')}"
  private val Labels = graft.sources.SynthImages.LABELS.toSeq

  /** (name, isFloatingPoint) of the q55 output, in exact column order —
    * q56's lineage digest concatenates the row in THIS order on both
    * engines, so the list exists once. Keep in sync with
    * [[roundedFeatureCols]] (EntryContractSpec pins the q55 schema). */
  private[queries] val flagshipDigestCols: Seq[(String, Boolean)] =
    Seq(("entity", false), ("ws_sec", false), ("n_images", false),
      ("brightness_mean", true), ("brightness_std", true),
      ("brightness_skew", true), ("brightness_kurt", true),
      ("abs_delta_mean", true), ("n_ascending", false),
      ("n_descending", false), ("caption_tokens_mean", true),
      ("aspect_mean", true), ("lossy_share", true), ("n_sessions", false),
      ("n_labels", false), ("weight_max", true)) ++
      Labels.map(l => (shareCol(l), true)) ++
      Seq(("label_share_major", true), ("label_share_minor", true),
        ("label_share_dim", true))

  /** Driver-comparable projection of the module aggregates: r6-rounded
    * doubles, integral counts as-is. Shared by q55 and q65. */
  private def roundedFeatureCols: Seq[Column] = Seq(
    col("n_images"),
    r6(col("brightness_mean")).as("brightness_mean"),
    r6(col("brightness_std")).as("brightness_std"),
    r6(col("brightness_skew")).as("brightness_skew"),
    r6(col("brightness_kurt")).as("brightness_kurt"),
    r6(col("abs_delta_mean")).as("abs_delta_mean"),
    col("n_ascending"), col("n_descending"),
    r6(col("caption_tokens_mean")).as("caption_tokens_mean"),
    r6(col("aspect_mean")).as("aspect_mean"),
    r6(col("lossy_share")).as("lossy_share"),
    col("n_sessions"), col("n_labels"),
    r6(col("weight_max")).as("weight_max")) ++
    Labels.map(l => r6(col(shareCol(l))).as(shareCol(l)))

  val queries: Map[String, QueryFn] = Map(
    // The product composition at 20k rows x 64 entities (hot-entity skew on):
    // raw features from the REAL pipeline, then the driver-comparable
    // projection (epoch-seconds window key) and the group_columns family
    // sums over the rounded shares — mirroring Main's post-process chain.
    "q55_flagship_features" -> ((s, dir) => {
      val raw = FeaturePipeline.runSynthetic(s, 20000, 64)
      val rounded = raw.select(
        col("entity") +: unix_timestamp(col("window_start")).as("ws_sec") +:
          roundedFeatureCols: _*)
      val withFams = PostProcessor.groupColumnFamilies(rounded,
        graft.Main.labelShareFamilies(rounded.columns.toSeq))
      withFams
        .withColumn("label_share_major", r6(col("label_share_major")))
        .withColumn("label_share_minor", r6(col("label_share_minor")))
        .withColumn("label_share_dim", r6(col("label_share_dim")))
    }),

    // musif's native sliding measure-window mode, size 10 / overlap 5:
    // per-(entity, window_id) feature rows; lag/session state is scoped to
    // the window slice (the reference extracts each slice independently).
    "q65_flagship_sliding" -> ((s, dir) => {
      val imgs = graft.sources.SynthImages.images(s, 20000, 64)
      val lbls = graft.sources.SynthImages.labels(s, 20000, 64)
      val raw = FeaturePipeline.featuresSliding(imgs, lbls, size = 10, overlap = 5)
      raw.select(
        col("entity") +: col("window_id") +: col("window_range") +:
          roundedFeatureCols: _*)
    }))

  // ------------------------------------------------------------ oracle SQL

  /** prep/lab/as-of CTE prefix shared by both flagship oracles. */
  private val prepJoinCtes =
    s"""WITH prep AS (
       | SELECT * FROM read_parquet('__SYNTH_DIR__/flagship_prepared/*.parquet')),
       |lab0 AS (
       | SELECT * FROM read_parquet('__SYNTH_DIR__/flagship_labels/*.parquet')
       | WHERE phash IS NOT NULL AND label_ts_sec IS NOT NULL),
       |lab AS (
       | SELECT phash, label_ts_sec, label, weight FROM (
       |  SELECT *, row_number() OVER (PARTITION BY phash, label_ts_sec
       |    ORDER BY label DESC, weight DESC) AS rnk FROM lab0) WHERE rnk = 1),
       |j AS (
       | SELECT p.*, l.label, l.weight FROM prep p ASOF LEFT JOIN lab l
       |  ON p.phash = l.phash AND p.ts_sec >= l.label_ts_sec)""".stripMargin

  /** Enrichment (lag + session flag/cumsum over `part`) + grouped module
    * aggregates, reading from CTE `src`, grouping by the two key
    * expressions (`key1Expr AS key1Name`, ...).
    *
    * Skew/kurtosis are mirrored with a TWO-PASS CENTERED computation (per
    * group: c = avg, then moments of (x - c) with the exact residual-mean
    * correction) rather than DuckDB's built-in aggregates: flagship windows
    * run means ~1e2 with sigma down to ~1e-3, where any raw-power-sum
    * implementation — DuckDB's included — loses all significant digits to
    * cancellation (observed: built-in kurtosis ~2e5 vs true 2.59) AND
    * varies run-to-run with thread summation order. The centered form and
    * Spark's streaming central-moment built-ins are both ~1e-13 of the
    * true value, so they agree at r6 robustly. */
  private def enrichAggCtes(src: String, part: String,
                            key1Expr: String, key1Name: String,
                            key2Expr: String, key2Name: String): String = {
    val ord = s"PARTITION BY $part ORDER BY ts_sec, image_id"
    val shareSelects = Labels.map { l =>
      s"""round(CASE WHEN count(*) > 0 THEN
         |   sum(CASE WHEN label = '$l' THEN 1 ELSE 0 END)::DOUBLE / count(*)
         |   ELSE 0 END + 3.7e-10, 6) AS ${shareCol(l)}""".stripMargin
    }.mkString(",\n  ")
    val nLabels = Labels.map(l =>
      s"max(CASE WHEN label = '$l' THEN 1 ELSE 0 END)").mkString(" + ")
    s"""e AS (
       | SELECT *,
       |  brightness - lag(brightness) OVER ($ord) AS brightness_delta,
       |  CASE WHEN lag(ts_sec) OVER ($ord) IS NULL
       |    OR ts_sec - lag(ts_sec) OVER ($ord) > 3600 THEN 1 ELSE 0 END AS is_new
       | FROM $src),
       |sess AS (
       | SELECT *, sum(is_new) OVER ($ord
       |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS session_id
       | FROM e),
       |sk AS (SELECT *, $key1Expr AS __k1, $key2Expr AS __k2 FROM sess),
       |ctr AS (SELECT __k1, __k2, avg(brightness) AS __c FROM sk GROUP BY 1, 2),
       |sc AS (
       | SELECT sk.*, sk.brightness - ctr.__c AS __y
       | FROM sk JOIN ctr ON sk.__k1 = ctr.__k1 AND sk.__k2 = ctr.__k2),
       |gs AS (
       | SELECT __k1 AS $key1Name, __k2 AS $key2Name,
       |  count(*)::BIGINT AS n_images,
       |  count(brightness)::DOUBLE AS nb,
       |  sum(__y) AS t1,
       |  sum(__y * __y) AS t2,
       |  sum(__y * __y * __y) AS t3,
       |  sum(__y * __y * __y * __y) AS t4,
       |  round(avg(brightness) + 3.7e-10, 6) AS brightness_mean,
       |  round(CASE WHEN count(brightness) > 1 THEN stddev(brightness) END + 3.7e-10, 6) AS brightness_std,
       |  round(avg(abs(brightness_delta)) + 3.7e-10, 6) AS abs_delta_mean,
       |  sum(CASE WHEN brightness_delta > 0 THEN 1 ELSE 0 END)::BIGINT AS n_ascending,
       |  sum(CASE WHEN brightness_delta < 0 THEN 1 ELSE 0 END)::BIGINT AS n_descending,
       |  round(avg(caption_tokens::DOUBLE) + 3.7e-10, 6) AS caption_tokens_mean,
       |  round(avg(aspect) + 3.7e-10, 6) AS aspect_mean,
       |  round(CASE WHEN count(*) > 0 THEN
       |    sum(CASE WHEN fmt = 'jpg' THEN 1 ELSE 0 END)::DOUBLE / count(*)
       |    ELSE 0 END + 3.7e-10, 6) AS lossy_share,
       |  (max(session_id) - min(session_id) + 1)::BIGINT AS n_sessions,
       |  ($nLabels)::BIGINT AS n_labels,
       |  round(max(weight) + 3.7e-10, 6) AS weight_max,
       |  $shareSelects
       | FROM sc GROUP BY 1, 2),
       |-- exact central moments from the well-conditioned residual sums
       |-- (t1/nb is the tiny residual mean; the corrections make the result
       |-- exact for ANY center)
       |gm AS (
       | SELECT *, t2 / nb - (t1 / nb) * (t1 / nb) AS m2,
       |  t3 / nb - 3 * (t1 / nb) * (t2 / nb) + 2 * (t1 / nb) ^ 3 AS m3,
       |  t4 / nb - 4 * (t1 / nb) * (t3 / nb)
       |    + 6 * (t1 / nb) ^ 2 * (t2 / nb) - 3 * (t1 / nb) ^ 4 AS m4
       | FROM gs),
       |g AS (
       | SELECT * EXCLUDE (nb, t1, t2, t3, t4, m2, m3, m4),
       |  round(CASE WHEN nb >= 3 AND m2 > 0
       |    THEN m3 / pow(m2, 1.5) * sqrt(nb * (nb - 1)) / (nb - 2)
       |    END + 3.7e-10, 6) AS brightness_skew,
       |  round(CASE WHEN nb >= 4 AND m2 > 0
       |    THEN ((nb + 1) * (m4 / (m2 * m2) - 3.0) + 6) * (nb - 1)
       |      / ((nb - 2) * (nb - 3))
       |    END + 3.7e-10, 6) AS brightness_kurt
       | FROM gm)""".stripMargin
  }

  /** The COMPLETE q55 feature table as a CTE chain ending in `feat` —
    * q55's oracle selects it verbatim; q56's lineage oracle appends its
    * digest aggregation on top, so the two replay the identical features. */
  private[queries] val flagshipFeatureCtes: String = {
    // family sums over the ROUNDED members in sorted-name order — exactly
    // the Spark side's groupColumnFamilies fold
    def fam(q: String) = Labels.map(shareCol).filter(_.endsWith(s"_$q")).sorted
      .map(m => s"coalesce($m, 0.0)").mkString(" + ")
    s"""$prepJoinCtes,
       |${enrichAggCtes("j", "phash",
           "phash", "entity", "(ts_sec // 600 * 600)::BIGINT", "ws_sec")},
       |feat AS (
       | SELECT *,
       |  round((${fam("maj")}) + 3.7e-10, 6) AS label_share_major,
       |  round((${fam("min")}) + 3.7e-10, 6) AS label_share_minor,
       |  round((${fam("dim")}) + 3.7e-10, 6) AS label_share_dim
       | FROM g)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q55_flagship_features" ->
      s"$flagshipFeatureCtes\nSELECT * FROM feat",

    "q65_flagship_sliding" -> {
      // window-id explode formula == WindowOps.slidingWindowIds (oracled by
      // q28); trailing partial windows are cut by musif's
      // number_windows = (n - overlap) // hop
      s"""$prepJoinCtes,
         |seq AS (
         | SELECT *,
         |  row_number() OVER (PARTITION BY phash ORDER BY ts_sec, image_id) - 1 AS rn0,
         |  count(*) OVER (PARTITION BY phash) AS n
         | FROM j),
         |x AS (
         | SELECT *, unnest(generate_series(
         |   greatest(0, CAST(ceil((rn0 - 10 + 1) / 5.0) AS BIGINT)),
         |   rn0 // 5)) AS window_id
         | FROM seq),
         |f AS (
         | SELECT * FROM x
         | WHERE window_id < greatest(CAST(floor((n - 5) / 5.0) AS BIGINT), 0)),
         |${enrichAggCtes("f", "phash, window_id",
             "phash", "entity", "window_id", "window_id")}
         |SELECT *,
         | '[' || (window_id * 5)::VARCHAR || ', ' ||
         |   (window_id * 5 + 10)::VARCHAR || ')' AS window_range
         |FROM g""".stripMargin
    })
}
