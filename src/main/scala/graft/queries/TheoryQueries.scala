package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.MusicTheory
import Q._

/** F3-F5 scalar families (key/scale/meter/harmonic-function arithmetic)
  * exercised over a derived column set from `events` — every function is
  * DuckDB-oracled: the degree/sharps arithmetic is mirrored as SQL CASE
  * chains; the harmonic-function oracle is a literal lookup of the expected
  * value per (numeral, mode), independently derived from the reference's
  * `get_function_first` control flow. */
object TheoryQueries {

  private val Numerals = Seq("I", "v", "vii", "bII", "IV", "iii", "bVII")
  private val TimeSigs = Seq("4/4", "6/8", "3/4", "9/8", "7/8")

  val queries: Map[String, QueryFn] = Map(
    "q42_music_theory" -> ((s, dir) => {
      val base = t(s, dir, "events").select(
        col("event_id"),
        pmod(col("event_id"), lit(12)).cast("int").as("pc"),
        pmod(col("user_id"), lit(12)).cast("int").as("tonic"),
        (pmod(col("user_id"), lit(2)) === 1).as("minor"),
        element_at(typedLit(Numerals), (pmod(col("event_id"), lit(7)) + 1).cast("int")).as("numeral"),
        element_at(typedLit(TimeSigs), (pmod(col("event_id"), lit(5)) + 1).cast("int")).as("tsig"))
      base.select(
        col("event_id"),
        MusicTheory.scaleDegree(col("pc"), col("tonic"), col("minor")).as("degree"),
        MusicTheory.keySharps(col("tonic"), col("minor")).cast("long").as("sharps"),
        MusicTheory.keySignatureString(col("tonic"), col("minor")).as("keysig"),
        MusicTheory.timeSignatureType(col("tsig")).as("ts_type"),
        MusicTheory.harmonicFunction(col("numeral"),
          when(col("minor"), "m").otherwise("M")).as("hfunc"))
    }))

  val oracles: Map[String, String] = Map(
    "q42_music_theory" ->
      """WITH base AS (
        | SELECT event_id,
        |  (event_id % 12)::INT AS pc,
        |  (user_id % 12)::INT AS tonic,
        |  (user_id % 2 = 1) AS minor,
        |  (event_id % 7)::INT AS ni,
        |  (['4/4','6/8','3/4','9/8','7/8'])[(event_id % 5)::INT + 1] AS tsig
        | FROM events),
        |d AS (
        | SELECT *, ((pc - tonic) % 12 + 12) % 12 AS rel,
        |  CASE WHEN minor THEN ((tonic + 3) % 12) ELSE tonic END AS majt
        | FROM base),
        |e AS (
        | SELECT *,
        |  CASE WHEN NOT minor THEN
        |    CASE rel WHEN 0 THEN 1 WHEN 2 THEN 2 WHEN 4 THEN 3 WHEN 5 THEN 4
        |      WHEN 7 THEN 5 WHEN 9 THEN 6 WHEN 11 THEN 7 END
        |  ELSE
        |    CASE rel WHEN 0 THEN 1 WHEN 2 THEN 2 WHEN 3 THEN 3 WHEN 5 THEN 4
        |      WHEN 7 THEN 5 WHEN 8 THEN 6 WHEN 10 THEN 7 END
        |  END AS degree,
        |  CASE WHEN (majt * 7) % 12 >= 6 THEN (majt * 7) % 12 - 12
        |    ELSE (majt * 7) % 12 END AS sharps
        | FROM d)
        |SELECT event_id, degree::INT AS degree, sharps::BIGINT AS sharps,
        | CASE WHEN sharps > 0 THEN repeat('s', sharps::INT)
        |   WHEN sharps < 0 THEN repeat('b', (-sharps)::INT)
        |   ELSE 'n' END AS keysig,
        | CASE tsig WHEN '4/4' THEN 'simple duple' WHEN '6/8' THEN 'compound duple'
        |   WHEN '3/4' THEN 'simple triple' WHEN '9/8' THEN 'compound triple'
        |   ELSE 'other' END AS ts_type,
        | CASE ni WHEN 0 THEN 'T' WHEN 1 THEN 'd' WHEN 2 THEN 'D' WHEN 3 THEN 'NAP'
        |   WHEN 4 THEN 'SD' WHEN 5 THEN 'med'
        |   WHEN 6 THEN (CASE WHEN minor THEN 'bST' ELSE 'ST' END) END AS hfunc
        |FROM e""".stripMargin)
}
