package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Q._

/** Output-shaping operator family (SURVEY.md §2.4 A3 pivot, §2.6 O1 ref-sort
  * / O5 first-seen dedup, §2.5 W6 resample, §2.7 F1 string/JSON parse).
  *
  * The pivot's category domain is fixed (5 event types) so the wide schema is
  * deterministic and bounded — the long-format-then-pivot-last discipline
  * SURVEY.md §1.2 prescribes for sparse families. */
object ShapeQueries {

  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")
  // canonical reference order (musif SCORING_ORDER analog, common/sort.py:9-56)
  private val RefOrder = Seq("signup", "click", "view", "purchase", "error")

  val queries: Map[String, QueryFn] = Map(
    // A3: histogram pivoted wide — explicit value list keeps the schema
    // fixed and skips the extra distinct-scan Spark needs for open pivots
    "q15_pivot" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", EventTypes)
        .agg(r4(coalesce(sum(col("value")), lit(0.0))))
        .select(col("user_id") +: EventTypes.map(e => coalesce(col(e), lit(0.0)).as(e)): _*)
    }),

    // O1: reference-list sort key — orphans (not in the list) rank last
    "q16_refsort" -> ((s, dir) => {
      val rank = array_position(typedLit(RefOrder), col("event_type"))
      t(s, dir, "events")
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .withColumn("ref_rank",
          when(rank > 0, rank).otherwise(lit(Long.MaxValue)))
    }),

    // W6: duration-resample — one row per elapsed 5-value step (generator
    // shape: 1 row -> N rows, no shuffle; explode(sequence))
    "q17_resample" -> ((s, dir) => {
      val steps = least(greatest(floor(col("value") / 5.0), lit(1.0)), lit(10.0)).cast("long")
      t(s, dir, "events")
        .withColumn("step", explode(sequence(lit(0L), steps - 1)))
        .select(col("event_id"), col("step"),
          (unix_timestamp(col("ts")) + col("step") * 60L).as("step_sec"))
    }),

    // F1: JSON property extraction from the props column
    "q18_json_props" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(count(col("k")).as("n_k"), r6(avg(col("k"))).as("avg_k"),
          max(col("k")).as("max_k"))
    }),

    // O5: first-seen-order dedup — per user, distinct event types joined in
    // order of first occurrence (deterministic: array_sort on (ts,event_id))
    "q19_first_seen" -> ((s, dir) => {
      val wFirst = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("rn", row_number().over(wFirst)).where(col("rn") === 1)
        .groupBy(col("user_id"))
        .agg(array_join(
          transform(
            array_sort(collect_list(struct(col("ts"), col("event_id"), col("event_type")))),
            x => x.getField("event_type")), ",").as("types_first_seen"))
    }))

  private def pivotSql: String = {
    val cols = EventTypes.map(e =>
      s"round(coalesce(sum(CASE WHEN event_type = '$e' THEN value END), 0) + 3.7e-10, 4) AS $e")
      .mkString(",\n ")
    s"SELECT user_id,\n $cols\nFROM events GROUP BY user_id"
  }

  val oracles: Map[String, String] = Map(
    "q15_pivot" -> pivotSql,

    "q16_refsort" -> {
      val cases = RefOrder.zipWithIndex
        .map { case (e, i) => s"WHEN '$e' THEN ${i + 1}" }.mkString(" ")
      s"""SELECT event_type, count(*)::BIGINT AS n,
         | (CASE event_type $cases ELSE ${Long.MaxValue} END)::BIGINT AS ref_rank
         |FROM events GROUP BY event_type""".stripMargin
    },

    "q17_resample" ->
      s"""WITH s AS (
         | SELECT event_id, ts,
         |  least(greatest(floor(value / 5.0), 1), 10)::BIGINT AS n_steps
         | FROM events),
         |x AS (
         | SELECT event_id, ts, unnest(generate_series(0, n_steps - 1)) AS step
         | FROM s)
         |SELECT event_id, step::BIGINT AS step,
         | (${sqlEpoch("ts")} + step * 60)::BIGINT AS step_sec
         |FROM x""".stripMargin,

    "q18_json_props" ->
      """SELECT event_type, count(k)::BIGINT AS n_k,
        | round(avg(k) + 3.7e-10, 6) AS avg_k, max(k)::BIGINT AS max_k
        |FROM (SELECT event_type, json_extract(props, '$.k')::BIGINT AS k FROM events)
        |GROUP BY event_type""".stripMargin,

    "q19_first_seen" ->
      """WITH firsts AS (
        | SELECT user_id, event_type, ts, event_id FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
        |    ORDER BY ts, event_id) AS rn FROM events)
        | WHERE rn = 1)
        |SELECT user_id,
        | string_agg(event_type, ',' ORDER BY ts, event_id) AS types_first_seen
        |FROM firsts GROUP BY user_id""".stripMargin)
}
