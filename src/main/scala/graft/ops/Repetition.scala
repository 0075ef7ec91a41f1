package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gopher-style within-document repetition signals over a (doc_id, nt)
  * frame of normalized text: distinct-token ratio, the share of 2-gram
  * occurrences taken by the most frequent 2-gram, and the share of 3-gram
  * occurrences whose gram repeats (the "fraction of characters in
  * duplicate n-grams" rule, token-counted). Empty documents emit no row.
  *
  * Shape: explode -> (doc, gram) hash agg -> (doc) hash agg — partial
  * aggregation combines the gram explosion map-side, so the shape scales;
  * no windows. Ratio columns are rounded through [[graft.queries.Q.r6]]'s
  * convention (6 dp + tie epsilon) for cross-engine comparability.
  */
object Repetition {

  private def r6(c: org.apache.spark.sql.Column) =
    round(c + lit(Stats.TieEps), 6)

  def signals(docs: DataFrame): DataFrame = {
    val d = docs
      .where(length(col("nt")) > 0)
      .select(col("doc_id"), split(col("nt"), " ").as("ts"))
    def grams(n: Int) = d.where(size(col("ts")) >= n)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("ts")) - n),
          i => concat_ws(" ", (0 until n).map(j =>
            element_at(col("ts"), i + lit(j + 1))): _*))).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
    val g2 = grams(2).groupBy("doc_id")
      .agg(max(col("c")).as("top2"), sum(col("c")).as("n2"))
    val g3 = grams(3).groupBy("doc_id")
      .agg(sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dup3"),
        sum(col("c")).as("n3"))
    d.join(g2, Seq("doc_id"), "left").join(g3, Seq("doc_id"), "left")
      .select(col("doc_id"), size(col("ts")).cast("long").as("n_tokens"),
        r6(size(array_distinct(col("ts"))).cast("double") / size(col("ts")))
          .as("distinct_ratio"),
        r6(coalesce(col("top2").cast("double") / col("n2"), lit(0.0)))
          .as("top2gram_frac"),
        r6(coalesce(col("dup3").cast("double") / col("n3"), lit(0.0)))
          .as("dup3gram_frac"))
  }
}
