package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.Text
import Q._

/** Text-analysis + dedup family over `documents`: token counting,
  * fingerprinting/exact dedup, language-ID heuristic, quality scoring,
  * stopword ratio, n-gram Jaccard near-dup pairs. All built from codegen'd
  * built-ins with byte-identical DuckDB formulations. */
object TextQueries {

  val queries: Map[String, QueryFn] = Map(
    "q34_token_count" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        Text.tokenCount(col("text")).cast("long").as("n_tokens"),
        length(Text.normText(col("text"))).cast("long").as("n_chars_norm"),
        Text.fingerprint(col("text")).as("fp"))
    }),

    // exact dedup via normalized-text fingerprint: one representative
    // (min doc_id) + group size per distinct content
    "q35_dedup_exact" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(Text.fingerprint(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
    }),

    "q36_langid" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        Text.langId(col("text")).as("lang_pred"),
        Text.langScore(Text.normText(col("text")), Text.EnMarkers).cast("long").as("en_score"))
    }),

    "q37_quality" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        r6(Text.qualityScore(col("text"))).as("quality"),
        r6(Text.stopwordRatio(col("text"))).as("stopword_ratio"))
    }),

    // n-gram (token-set) Jaccard near-dup pairs within a source
    "q38_ngram_jaccard" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .where(col("doc_id") < 200)
        .select(col("doc_id"), col("source"),
          array_distinct(split(Text.normText(col("text")), " ")).as("toks"))
      val a = d.select(col("source"), col("doc_id").as("d1"), col("toks").as("t1"))
      val b = d.select(col("source"), col("doc_id").as("d2"), col("toks").as("t2"))
      a.join(b, Seq("source"))
        .where(col("d1") < col("d2"))
        .withColumn("inter", size(array_intersect(col("t1"), col("t2"))).cast("double"))
        .withColumn("jaccard",
          col("inter") / (size(col("t1")) + size(col("t2")) - col("inter")))
        .where(col("jaccard") >= 0.6)
        .select(col("source"), col("d1"), col("d2"), r6(col("jaccard")).as("jaccard"))
    }))

  // exact whole-token count, mirroring Text.tokenOccurrences (split+filter)
  private def occSql(normExpr: String, word: String): String =
    s"len(list_filter(string_split($normExpr, ' '), x -> x = '$word'))::INT"
  private def scoreSql(markers: Seq[String]): String =
    markers.map(w => occSql("nt", w)).mkString(" + ")

  val oracles: Map[String, String] = {
    val norm = sqlNorm("text")
    Map(
      "q34_token_count" ->
        s"""SELECT doc_id,
           | (CASE WHEN length($norm) = 0 THEN 0
           |   ELSE len(string_split($norm, ' ')) END)::BIGINT AS n_tokens,
           | length($norm)::BIGINT AS n_chars_norm,
           | md5($norm) AS fp
           |FROM documents""".stripMargin,

      "q35_dedup_exact" ->
        s"""SELECT md5($norm) AS fp, min(doc_id) AS keep_doc_id,
           | count(*)::BIGINT AS n_copies
           |FROM documents GROUP BY 1""".stripMargin,

      "q36_langid" ->
        s"""WITH n AS (SELECT doc_id, $norm AS nt FROM documents),
           |s AS (SELECT doc_id,
           |  ${scoreSql(Text.EnMarkers)} AS en_s,
           |  ${scoreSql(Text.DeMarkers)} AS de_s,
           |  ${scoreSql(Text.FrMarkers)} AS fr_s
           | FROM n)
           |SELECT doc_id,
           | CASE WHEN en_s = 0 AND de_s = 0 AND fr_s = 0 THEN 'und'
           |      WHEN en_s >= de_s AND en_s >= fr_s THEN 'en'
           |      WHEN de_s >= fr_s THEN 'de' ELSE 'fr' END AS lang_pred,
           | en_s::BIGINT AS en_score
           |FROM s""".stripMargin,

      "q37_quality" ->
        s"""WITH n AS (
           | SELECT doc_id, $norm AS nt FROM documents),
           |m AS (
           | SELECT doc_id, nt,
           |  (CASE WHEN length(nt) = 0 THEN 0
           |    ELSE len(string_split(nt, ' ')) END)::DOUBLE AS toks,
           |  len(list_distinct(string_split(nt, ' ')))::DOUBLE AS dtoks
           | FROM n)
           |SELECT doc_id,
           | round(CASE WHEN toks = 0 THEN 0
           |  ELSE 0.4 * least(1.0, toks / 100.0)
           |     + 0.3 * (dtoks / toks)
           |     + 0.3 * least(1.0, ((length(nt) - (toks - 1)) / toks) / 8.0) END + 3.7e-10, 6) AS quality,
           | round(CASE WHEN toks = 0 THEN 0
           |  ELSE (${scoreSql(Text.EnMarkers)}) / toks END + 3.7e-10, 6) AS stopword_ratio
           |FROM m""".stripMargin,

      "q38_ngram_jaccard" ->
        s"""WITH d AS (
           | SELECT doc_id, source,
           |  list_distinct(string_split($norm, ' ')) AS toks
           | FROM documents WHERE doc_id < 200),
           |p AS (
           | SELECT a.source, a.doc_id AS d1, b.doc_id AS d2,
           |  len(list_intersect(a.toks, b.toks))::DOUBLE AS inter,
           |  len(a.toks) AS la, len(b.toks) AS lb
           | FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id)
           |SELECT source, d1, d2,
           | round(inter / (la + lb - inter) + 3.7e-10, 6) AS jaccard
           |FROM p WHERE inter / (la + lb - inter) >= 0.6""".stripMargin)
  }
}
