package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** The keep/drop DECISION layer a corpus pipeline runs after scoring —
  * C4/Gopher-style named rules composed from the quality (q37) and
  * repetition (q92 / [[Repetition]]) signals, reported ErrorChannel-style:
  * every document gets a `keep` flag and the ';'-joined list of the rules
  * it violated, so a drop is always attributable.
  *
  * All signal arithmetic is identical expression trees on both engines
  * (the repetition ratios carry the shared 6-dp rounding), so threshold
  * comparisons are deterministic cross-engine. Shape: the repetition
  * aggregates are the only shuffle; every rule is a per-row expression.
  */
object QualityFilter {

  /** Gopher-flavored defaults, scaled to the synthetic corpus. */
  case class Thresholds(
      minTokens: Int = 5,
      maxTokens: Int = 1000,
      minDistinctRatio: Double = 0.3,
      maxTop2GramFrac: Double = 0.2,
      maxDup3GramFrac: Double = 0.2,
      minMeanWordLen: Double = 2.0,
      maxMeanWordLen: Double = 12.0,
      minStopwords: Int = 1,
      /** Repetition fractions are meaningless on a handful of grams (a
        * 3-token doc's top 2-gram share is 1/2 by construction), so the
        * repetition rules only arm above this token mass. */
      minTokensForRepetition: Int = 10)

  /** `docs` = (doc_id, nt) normalized text. Emits one row per document:
    * (doc_id, n_tokens, keep, reasons). */
  def classify(docs: DataFrame, t: Thresholds = Thresholds()): DataFrame = {
    val base = docs.select(col("doc_id"), col("nt"),
      when(length(col("nt")) === 0, 0)
        .otherwise(size(split(col("nt"), " "))).cast("long").as("toks"),
      Text.langScore(col("nt"), Text.EnMarkers).cast("long").as("stopwords"),
      length(col("nt")).cast("long").as("chars"))
    val joined = base.join(Repetition.signals(docs), Seq("doc_id"), "left")
    val meanWordLen =
      (col("chars") - (col("toks") - 1)).cast("double") / col("toks")
    val checks: Seq[(String, Column)] = Seq(
      // coalesce: a NULL nt (hence NULL toks) is the clearest drop
      // candidate and must flag 'empty', not slip through the NULL->false
      // suppression the other rules rely on
      "empty" -> (coalesce(col("toks"), lit(0L)) === 0),
      "too_few_tokens" -> (col("toks") > 0 && col("toks") < t.minTokens),
      "too_many_tokens" -> (col("toks") > t.maxTokens),
      "low_distinct_ratio" -> (col("distinct_ratio") < t.minDistinctRatio),
      "high_top2gram" -> (col("toks") >= t.minTokensForRepetition &&
        col("top2gram_frac") > t.maxTop2GramFrac),
      "high_dup3gram" -> (col("toks") >= t.minTokensForRepetition &&
        col("dup3gram_frac") > t.maxDup3GramFrac),
      "word_length" -> (col("toks") > 0 &&
        (meanWordLen < t.minMeanWordLen || meanWordLen > t.maxMeanWordLen)),
      "low_stopword" -> (col("toks") > 0 && col("stopwords") < t.minStopwords))
    // NULL signal columns (empty docs have no repetition row) must not
    // flag: when(NULL, name) takes the otherwise(NULL) branch, same as SQL
    val reasonArr = array(checks.map { case (name, cond) =>
      when(coalesce(cond, lit(false)), name).otherwise(lit(null))
    }: _*)
    joined.select(col("doc_id"),
      coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
      array_join(filter(reasonArr, x => x.isNotNull), ";").as("reasons"))
      .withColumn("keep", col("reasons") === "")
  }
}
