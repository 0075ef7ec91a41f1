package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.ImageFunctions
import graft.ops.{Stats, WindowOps}
import graft.sources.SynthImages

/** musif's plugin surface re-expressed for Spark: a feature module
  * contributes (a) row-level enrichment columns over the per-entity ordered
  * stream and (b) window-level aggregate expressions. Modules declare
  * dependencies by name and run in topological order — the analog of
  * `update_part_objects`/`update_score_objects` discovery plus the
  * `musif_dependencies` order check
  * (`/root/reference/musif/extract/extract.py:498-511,689-724`).
  *
  * Row-level enrichment stays narrow (no shuffle): every module operates on
  * the entity-partitioned stream the as-of join already produced, so adding
  * modules never adds exchanges — only expressions and window functions over
  * the same partitioning.
  */
trait FeatureModule {
  def name: String
  def dependencies: Seq[String] = Nil
  /** Pre-shuffle row-level stage: pure per-row columns computed BEFORE the
    * entity exchange, so heavy payload columns (bytes, caption) can be
    * pruned from the shuffle — at 100 TB the exchange then moves ~80 bytes
    * of derived features per row instead of the raw payload. Must not use
    * window functions. */
  def prepare(df: DataFrame): DataFrame = df
  /** Columns `prepare` adds that must survive the pre-shuffle projection. */
  def preparedCols: Seq[String] = Nil
  /** Raw input columns still needed after the join (kept in the shuffle). */
  def rawCols: Seq[String] = Nil
  /** Post-shuffle row-level stage: order-dependent columns (lag, sessions)
    * over the `entityCols`-partitioned stream. The time-window pipeline
    * passes the entity alone; the sliding-measure-window mode passes
    * (entity, window_id) so state never crosses a window boundary — musif
    * re-extracts every window slice independently
    * (`extract/extract.py:416-464`). */
  def enrich(df: DataFrame, entityCols: Seq[String]): DataFrame = df
  /** Window-level: aggregates over the enriched columns. */
  def aggregates: Seq[Column] = Nil
}

object FeatureModules {

  /** Per-chunk event order shared by all module window functions. */
  def entityWindow(entityCols: Seq[String]) =
    Window.partitionBy(entityCols.map(col): _*).orderBy(col("ts"), col("image_id"))

  object CoreModule extends FeatureModule {
    val name = "core"
    override def aggregates = Seq(count(lit(1)).as("n_images"))
  }

  /** Brightness battery — melody-module analog (intervals = lag deltas,
    * moments over the series). */
  object BrightnessModule extends FeatureModule {
    val name = "brightness"
    override val dependencies = Seq("core")
    override def prepare(df: DataFrame): DataFrame = df
      .withColumn("brightness", ImageFunctions.mean_brightness(col("bytes")))
    override val preparedCols = Seq("brightness")
    override def enrich(df: DataFrame, entityCols: Seq[String]): DataFrame = df
      .withColumn("brightness_delta",
        col("brightness") - lag(col("brightness"), 1).over(entityWindow(entityCols)))
    override def aggregates = Seq(
      avg(col("brightness")).as("brightness_mean"),
      when(count(col("brightness")) > 1, stddev_samp(col("brightness"))).as("brightness_std"),
      // the streaming central-moment built-ins are the NUMERICALLY STABLE
      // choice: window means run ~1e2 with sigma down to ~1e-3, where any
      // raw-power-sum formulation loses up to ALL significant digits to
      // cancellation (DuckDB's built-in kurtosis returns ~2e5 where the
      // true value is 2.59 on such data — the flagship oracle therefore
      // mirrors these with a two-pass centered computation, not DuckDB's
      // aggregate)
      Stats.skewnessCorrected(col("brightness")).as("brightness_skew"),
      Stats.kurtosisCorrected(col("brightness")).as("brightness_kurt"),
      avg(abs(col("brightness_delta"))).as("abs_delta_mean"),
      sum(when(col("brightness_delta") > 0, 1).otherwise(0)).as("n_ascending"),
      sum(when(col("brightness_delta") < 0, 1).otherwise(0)).as("n_descending"))
  }

  /** Caption/text features — lyrics-module analog. */
  object CaptionModule extends FeatureModule {
    val name = "caption"
    override val dependencies = Seq("core")
    override def prepare(df: DataFrame): DataFrame = df
      .withColumn("caption_tokens", graft.functions.Text.tokenCount(col("caption")))
    override val preparedCols = Seq("caption_tokens")
    override def aggregates = Seq(
      avg(col("caption_tokens").cast("double")).as("caption_tokens_mean"))
  }

  /** Geometry/payload features — scoring-module analog. */
  object PayloadModule extends FeatureModule {
    val name = "payload"
    override def prepare(df: DataFrame): DataFrame = df
      .withColumn("aspect", col("w").cast("double") / col("h"))
    override val preparedCols = Seq("aspect")
    override val rawCols = Seq("fmt")
    override def aggregates = Seq(
      avg(col("aspect")).as("aspect_mean"),
      Stats.safeDiv(sum(when(col("fmt") === "jpg", 1).otherwise(0)),
        count(lit(1))).as("lossy_share"))
  }

  /** Sessionization — the W4 gap-session analog. */
  object SessionModule extends FeatureModule {
    val name = "session"
    override def enrich(df: DataFrame, entityCols: Seq[String]): DataFrame =
      WindowOps.sessionize(df, entityCols, "ts",
        FeaturePipeline.SessionGapSeconds, tieBreak = Seq("image_id"))
    override def aggregates = Seq(
      (max(col("session_id")) - min(col("session_id")) + 1).as("n_sessions"))
  }

  /** Config-driven session module: same aggregates, custom gap (used by the
    * GraftConfig pipeline overload so `session_gap_seconds` actually takes
    * effect instead of silently falling back to the default constant). */
  final case class SessionModuleWithGap(gapSeconds: Long) extends FeatureModule {
    val name = "session"
    override def enrich(df: DataFrame, entityCols: Seq[String]): DataFrame =
      WindowOps.sessionize(df, entityCols, "ts", gapSeconds, tieBreak = Seq("image_id"))
    override def aggregates = SessionModule.aggregates
  }

  /** As-of label features — harmony/scale_relative analog (the label column
    * itself is attached structurally by the pipeline's as-of join). */
  object LabelModule extends FeatureModule {
    val name = "label"
    override def aggregates = {
      val labelShares = SynthImages.LABELS.toSeq.map { l =>
        Stats.safeDiv(
          sum(when(col("label") === l, 1).otherwise(0)),
          count(lit(1))).as(s"label_share_${l.replace(':', '_')}")
      }
      Seq(
        SynthImages.LABELS.map(l =>
          max(when(col("label") === l, 1).otherwise(0))).reduce(_ + _)
          .cast("long").as("n_labels"),
        max(col("weight")).as("weight_max")) ++ labelShares
    }
  }

  val All: Seq[FeatureModule] = Seq(
    CoreModule, BrightnessModule, CaptionModule, PayloadModule,
    SessionModule, LabelModule)

  /** Resolve a requested module set: missing dependencies are an error
    * (musif raises on mis-ordered `musif_dependencies`; we toposort instead
    * and only reject genuinely absent or cyclic modules). Deterministic:
    * ties broken by requested order. */
  def resolve(requested: Seq[String],
              available: Seq[FeatureModule] = All): Seq[FeatureModule] = {
    val byName = available.map(m => m.name -> m).toMap
    requested.foreach { r =>
      require(byName.contains(r), s"unknown feature module: $r")
    }
    val want = scala.collection.mutable.LinkedHashSet[String]()
    def visit(n: String, path: List[String]): Unit = {
      require(!path.contains(n), s"module dependency cycle: ${(n :: path).reverse.mkString(" -> ")}")
      if (!want.contains(n)) {
        val m = byName.getOrElse(n,
          throw new IllegalArgumentException(s"module $n depends on unknown module"))
        m.dependencies.foreach(visit(_, n :: path))
        want += n
      }
    }
    requested.foreach(visit(_, Nil))
    want.toSeq.map(byName)
  }
}
