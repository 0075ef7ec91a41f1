package graft.pipeline

/** Pipeline configuration with musif's three-layer merge semantics —
  * hardcoded fallbacks <- config file <- explicit overrides
  * (`/root/reference/musif/config.py:111-152,161-214`) — minus the YAML
  * dependency: the file layer is java.util.Properties-style `key=value`
  * (no extra jars in the sandbox; the merge semantics are what matters).
  */
final case class GraftConfig(
    windowDuration: String = FeaturePipeline.WindowDuration,
    sessionGapSeconds: Long = FeaturePipeline.SessionGapSeconds,
    modules: Seq[String] = FeatureModules.All.map(_.name),
    useMergeExec: Boolean = true,
    maxNullColumnRatio: Double = 1.0,
    /** Negative = AUTO: derive from the output's null density at run time
      * (PostProcessor.adaptiveMaxNanRows, musif `__main__.py:160-171`). */
    maxNullRowRatio: Double = 1.0,
    lineageBuckets: Int = 64,
    /** musif `precache_hooks` analog (`extract/extract.py:613-617`,
      * docs/source/Hooks.md): user transforms applied to the validated
      * input stream BEFORE any module runs — programmatic only (functions
      * don't load from a properties file). */
    preHooks: Seq[org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame] = Nil) {

  def withOverrides(overrides: Map[String, String]): GraftConfig =
    overrides.foldLeft(this) { case (c, (k, v)) =>
      k match {
        case "window_duration" => c.copy(windowDuration = v)
        case "session_gap_seconds" => c.copy(sessionGapSeconds = v.toLong)
        case "modules" => c.copy(modules = v.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        case "use_merge_exec" => c.copy(useMergeExec = v.toBoolean)
        case "max_null_column_ratio" => c.copy(maxNullColumnRatio = v.toDouble)
        case "max_null_row_ratio" =>
          c.copy(maxNullRowRatio = if (v.trim == "auto") -1.0 else v.toDouble)
        case "lineage_buckets" => c.copy(lineageBuckets = v.toInt)
        case other => throw new IllegalArgumentException(s"unknown config key: $other")
      }
    }
}

object GraftConfig {

  /** fallbacks <- properties file (optional) <- kwargs-style overrides. */
  def load(propertiesFile: Option[String] = None,
           overrides: Map[String, String] = Map.empty): GraftConfig = {
    val fileLayer: Map[String, String] = propertiesFile match {
      case Some(path) =>
        val props = new java.util.Properties()
        val in = new java.io.FileInputStream(path)
        try props.load(in) finally in.close()
        import scala.jdk.CollectionConverters._
        props.asScala.toMap
      case None => Map.empty
    }
    GraftConfig().withOverrides(fileLayer).withOverrides(overrides)
  }
}
