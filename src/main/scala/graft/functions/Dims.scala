package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Literal dimension tables for the reference's tempo/dynamics vocabularies,
  * joined as BROADCAST dims (J6 shape) rather than per-row when-chains: the
  * vocabularies are data (100+ rows, curated, editable), and at scale a
  * small broadcast dim beats re-compiling a 100-branch CASE into every
  * query that touches the column.
  *
  * References:
  *  - DYNAMIC_VALUES mark -> MIDI-ish velocity level:
  *    `/root/reference/musif/extract/features/dynamics/constants.py:11-47`
  *  - tempo word normalization (base words + diminutive/superlative
  *    endings), "A tempo"/"Con brio" specials, and Slow/Moderate/Fast
  *    second-level grouping: `/root/reference/musif/musicxml/tempo.py:63-244`
  */
object Dims {

  /** Dynamic mark -> level, the reference table verbatim. */
  val DynamicLevels: Seq[(String, Int)] = Seq(
    "sfz" -> 127, "fz" -> 120, "ffff" -> 116, "fff" -> 112, "ff" -> 101,
    "più f" -> 96, "f assai" -> 94, "assaif" -> 94, "f" -> 88,
    "sempre f" -> 88, "poco f" -> 80, "mf" -> 75, "mp" -> 62, "p" -> 49,
    "più p" -> 46, "sempre p" -> 49, "p dolce" -> 49, "poco p" -> 49,
    "p assai" -> 42, "pp" -> 36, "ppp" -> 24, "sfp" -> 20, "pppp" -> 12,
    "sempre pp" -> 36, "sotto voce assai" -> 36, "dolce" -> 49)

  /** Base "important" tempo words (tempo.py:106-116). */
  val TempoBase: Seq[String] = Seq("adagio", "allegro", "andante",
    "andantino", "largo", "lento", "presto", "vivace", "minueto")

  /** Second-tier "relevant" words (tempo.py:131-153). */
  val TempoRelevant: Seq[String] = Seq("amoroso", "affettuoso", "agitato",
    "arioso", "cantabile", "comodo", "brio", "spiritoso", "espressivo",
    "fiero", "giusto", "grave", "grazioso", "gustoso", "maestoso",
    "moderato", "risoluto", "sostenuto", "tempo")

  /** -ietto/-issimo/... endings accepted on base words (tempo.py:118-125). */
  private val Group1Endings = Seq("etto", "ietto", "issimo", "ssimo", "hetto")
  private def group1Derivs(w: String): Seq[String] =
    w +: Group1Endings.map(e => w.init + e)

  private def capitalize(w: String): String = w.head.toUpper + w.tail

  /** word -> first-level tempo group: the matched word capitalized, with
    * the reference's "tempo" -> "A tempo" and "brio" -> "Con brio"
    * specials (tempo.py:158-180). */
  val TempoGroup1: Seq[(String, String)] =
    (TempoBase.flatMap(group1Derivs).map(w => w -> capitalize(w)) ++
      TempoRelevant.map {
        case "tempo" => "tempo" -> "A tempo"
        case "brio"  => "brio" -> "Con brio"
        case w       => w -> capitalize(w)
      }).distinct

  /** Endings accepted when classing group 1 into group 2 (tempo.py:196). */
  private val Group2Endings = Seq("ino", "etto", "ietto", "ssimo", "issimo", "hetto")
  private def group2Derivs(w: String): Seq[String] =
    w +: Group2Endings.map(e => w.init + e)
  private val SlowBasis =
    Seq("Adagio", "Affettuoso", "Grave", "Sostenuto", "Largo", "Lento")
  private val ModerateBasis = Seq("Andante", "Arioso", "Comodo", "Cantabile",
    "Espressivo", "Grazioso", "Gustoso", "Maestoso", "Minueto", "Moderato",
    "Marcía", "Amoroso")
  private val FastBasis = Seq("Agitato", "Allegro", "Con brio", "Spiritoso",
    "Fiero", "Presto", "Risoluto", "Vivace")

  /** group1 -> group2 ("Slow"/"Moderate"/"Fast"/"NA", tempo.py:185-244). */
  def tempoGroup2Of(g1: String): String =
    if (g1 == "A tempo" || g1 == "Giusto") "NA"
    else if (SlowBasis.flatMap(group2Derivs).contains(g1)) "Slow"
    else if (ModerateBasis.flatMap(group2Derivs).contains(g1)) "Moderate"
    else if (FastBasis.flatMap(group2Derivs).contains(g1)) "Fast"
    else "NA"

  /** The (word, group1, group2) rows — one source of truth for both the
    * Spark dim and the DuckDB oracle VALUES. */
  val TempoRows: Seq[(String, String, String)] =
    TempoGroup1.map { case (w, g1) => (w, g1, tempoGroup2Of(g1)) }

  def tempoDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    TempoRows.toDF("tempo_word", "tempo_group_1", "tempo_group_2")
  }

  def dynamicsDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    DynamicLevels.toDF("mark", "level")
  }

  private def sq(s: String): String = "'" + s.replace("'", "''") + "'"

  /** DuckDB VALUES fragments generated from the SAME rows as the Spark dims
    * — the oracle can't drift from the engine. */
  def dynamicsValuesSql: String =
    DynamicLevels.map { case (m, l) => s"(${sq(m)}, $l)" }.mkString(", ")
  def tempoValuesSql: String =
    TempoRows.map { case (w, g1, g2) => s"(${sq(w)}, ${sq(g1)}, ${sq(g2)})" }
      .mkString(", ")
}
