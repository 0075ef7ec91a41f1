package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.MusicTheory
import graft.ops.{Stats, WindowOps}
import Q._

/** Ordered per-entity analytics family (SURVEY.md §2.5): lag/lead intervals,
  * backfill, sessionization, rolling means, diff chains, run-length
  * segmentation, sliding/tumbling windows, ordered scans, positional ranks. */
object WindowQueries {

  /** Per-measure time-signature domain for the harmonic-rhythm analog. */
  private val HrTimeSigs = Seq("4/4", "6/8", "3/4", "9/8", "12/8")

  private val entOrder = Seq("ts", "event_id") // total order within user

  val queries: Map[String, QueryFn] = Map(
    // P3 tie-merge, ORACLED (the one §2 operator that was spec-only until
    // round 4): deterministic tie markers synthesized from event_id
    // (0 -> untied/null, 1 -> start, 2 -> continue, 3 -> stop, 4 -> the
    // '-' sentinel), then WindowOps.tieMerge collapses chains — heads are
    // every row whose marker is NOT continue/stop (plus the defensive
    // entity-first-row head), durations sum over the chain, head
    // attributes survive. DuckDB mirrors the head rule + running chain id.
    "q108_tie_merge" -> ((s, dir) => {
      val m = pmod(col("event_id"), lit(5))
      val b = t(s, dir, "events").select(
        col("user_id"), col("ts"), col("event_id"), col("event_type"),
        col("value"),
        when(m === 1, "start").when(m === 2, "continue")
          .when(m === 3, "stop").when(m === 4, "-").as("tie"),
        ((pmod(col("event_id"), lit(8)) + 1) / lit(2.0)).as("duration"))
      WindowOps.tieMerge(b, Seq("user_id"), entOrder,
          "tie", "duration", Seq("event_type", "value"))
        .select(col("user_id"), col("chain_id"), col("event_type"),
          r6(col("value")).as("value"), r4(col("duration")).as("duration"),
          col("chain_len"))
    }),

    // W1: lag-derived interval (melodic-interval analog), row-level
    "q20_lag_delta" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("delta", r6(col("value") - lag(col("value"), 1).over(w)))
        .select(col("event_id"), col("user_id"), r6(col("value")).as("value"), col("delta"))
    }),

    // W3: bounded-preceding backfill (last_value ignore nulls)
    "q21_backfill" -> ((s, dir) => {
      val sparse = t(s, dir, "events")
        .withColumn("v_sparse",
          when(col("event_type").isin("click", "purchase"), col("value")))
      WindowOps.backfill(sparse, Seq("user_id"), entOrder, Seq("v_sparse"))
        .select(col("event_id"), col("user_id"), r6(col("v_sparse_filled")).as("v_filled"))
    }),

    // W4: gap-based sessionization (30 min) + per-session aggregates
    "q22_sessionize" -> ((s, dir) => {
      WindowOps.sessionize(t(s, dir, "events"), Seq("user_id"), "ts", 1800L)
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          r4(sum(col("value"))).as("sum_value"),
          (max(unix_timestamp(col("ts"))) - min(unix_timestamp(col("ts")))).as("duration_sec"))
    }),

    // W5: centered rolling mean (+-2 rows)
    "q23_rolling_mean" -> ((s, dir) => {
      WindowOps.rollingMean(t(s, dir, "events"), Seq("user_id"), entOrder, "value", 2, "rmean")
        .select(col("event_id"), col("user_id"), r6(col("rmean")).as("rmean"))
    }),

    // W7: diff chains (speed/acceleration analog)
    "q24_diff_chain" -> ((s, dir) => {
      WindowOps.diffChain(t(s, dir, "events"), Seq("user_id"), entOrder, "value")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          r6(avg(abs(col("speed")))).as("avg_abs_speed"),
          r6(avg(abs(col("accel")))).as("avg_abs_accel"))
    }),

    // W9: consecutive-duplicate compression -> run counts
    "q25_compress" -> ((s, dir) => {
      WindowOps.compressRuns(t(s, dir, "events"), Seq("user_id"), entOrder, "event_type")
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_runs"))
    }),

    // A12/W4: run-length key areas — per (entity, key): segment count,
    // segment share ("modulatory" analog), mean run length
    "q26_run_segments" -> ((s, dir) => {
      val seg = WindowOps.runLength(t(s, dir, "events"), Seq("user_id"), entOrder, "event_type")
      val perSeg = seg.groupBy(col("user_id"), col("event_type"), col("segment_id"))
        .agg(count(lit(1)).as("seg_len"))
      val perKey = perSeg.groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n_segments"), avg(col("seg_len")).as("avg_run_len"))
      val tot = perSeg.groupBy(col("user_id")).agg(count(lit(1)).as("nseg_total"))
      perKey.join(tot, Seq("user_id"))
        .select(col("user_id"), col("event_type"), col("n_segments"),
          r6(col("n_segments").cast("double") / col("nseg_total")).as("seg_share"),
          r6(col("avg_run_len")).as("avg_run_len"))
    }),

    // W2 (time axis): tumbling event-time windows — the streaming-shaped op
    "q27_tumbling" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"), window(col("ts"), "6 hours").getField("start").as("wstart"))
        .agg(count(lit(1)).as("n"), r4(sum(col("value"))).as("sum_value"))
        .select(col("user_id"), unix_timestamp(col("wstart")).as("wstart_sec"),
          col("n"), col("sum_value"))
    }),

    // W2 (row axis): musif sliding measure-windows, size 10 / overlap 5
    "q28_sliding_measure" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val seq = t(s, dir, "events")
        .withColumn("rn0", (row_number().over(w) - 1).cast("long"))
      WindowOps.slidingWindowIds(seq, "rn0", size = 10, overlap = 5)
        .groupBy(col("user_id"), col("window_id"))
        .agg(count(lit(1)).as("n"), r6(avg(col("value"))).as("avg_value"))
    }),

    // W8/W10: first-pick + positional rank of firsts
    "q29_first_rank" -> ((s, dir) => {
      val wFirst = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      val firsts = t(s, dir, "events")
        .withColumn("rn", row_number().over(wFirst)).where(col("rn") === 1)
      val wPos = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      firsts.withColumn("pos", row_number().over(wPos).cast("long"))
        .select(col("user_id"), col("event_type"), col("event_id"), col("pos"))
    }),

    // A7: dynamics-style ordered scan — gradient + duration-weighted mean
    "q30_weighted_scan" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val e = t(s, dir, "events")
        .withColumn("prev_v", lag(col("value"), 1).over(w))
        .withColumn("dt",
          unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)))
        .withColumn("dur_next",
          unix_timestamp(lead(col("ts"), 1).over(w)) - unix_timestamp(col("ts")))
        .withColumn("grad", abs(col("value") - col("prev_v")) / greatest(col("dt"), lit(1L)))
      e.groupBy(col("user_id"))
        .agg(
          r6(avg(col("grad"))).as("dyn_grad"),
          r6(Stats.safeDiv(sum(col("value") * col("dur_next")), sum(col("dur_next")))).as("dyn_mean_weighted"),
          r6(avg(col("value"))).as("dyn_mean"))
    }),

    // A9: dotted-rhythm detection — the reference's lead-compare
    // (`extract/features/rhythm/handler.py:46-63`: a dotted element whose
    // NEXT element sits on the same beat with a smaller duration), with its
    // two denominators: sounding units for dotted, full span for
    // double-dotted. Minute buckets stand in for beats.
    "q32_dotted_rhythm" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val e = t(s, dir, "events")
        .withColumn("minute", date_trunc("minute", col("ts")))
        .withColumn("next_minute", lead(col("minute"), 1).over(w))
        .withColumn("next_value", lead(col("value"), 1).over(w))
      val flagged = e
        .withColumn("dotted",
          (pmod(col("event_id"), lit(4)) === 0) &&
            col("next_minute") === col("minute") && col("next_value") < col("value"))
        .withColumn("double_dotted",
          col("dotted") && pmod(col("event_id"), lit(8)) === 0)
      val perMinute = flagged.groupBy(col("user_id"), col("minute"))
        .agg(sum(when(col("dotted"), 1).otherwise(0)).as("n_dot"),
          sum(when(col("double_dotted"), 1).otherwise(0)).as("n_ddot"))
      perMinute.groupBy(col("user_id"))
        .agg(
          r6(sum(col("n_dot")).cast("double") / count(lit(1)))
            .as("dotted_per_active_minute"),
          r6(sum(col("n_ddot")).cast("double") /
            ((unix_timestamp(max(col("minute"))) - unix_timestamp(min(col("minute")))) / 60 + 1))
            .as("ddot_per_span_minute"))
    }),

    // A11: harmonic rhythm — chords per compressed measure and the
    // beats-normalized variant weighting each measure by its own time
    // signature (`extract/features/harmony/utils.py:19-60`). Minute buckets
    // = measures, events = chords, a derived per-measure tsig = the
    // (possibly changing) time signature.
    "q33_harmonic_rhythm" -> ((s, dir) => {
      val perMeasure = t(s, dir, "events")
        .groupBy(col("user_id"), date_trunc("minute", col("ts")).as("measure"))
        .agg(count(lit(1)).as("n_chords"))
        .withColumn("tsig", element_at(typedLit(HrTimeSigs),
          (pmod((unix_timestamp(col("measure")) / 60).cast("long"), lit(HrTimeSigs.size)) + 1).cast("int")))
        .withColumn("num", split(col("tsig"), "/").getItem(0).cast("int"))
        .withColumn("beats", MusicTheory.beatsPerMeasure(col("num"), lit(4)).cast("int"))
      perMeasure.groupBy(col("user_id"))
        .agg(
          r6(sum(col("n_chords")).cast("double") / count(lit(1))).as("harmonic_rhythm"),
          r6(sum(col("n_chords")).cast("double") / sum(col("beats"))).as("harmonic_rhythm_beats"))
    }),

    // A-family completion: rhythm intensity + average duration
    // (`extract/features/rhythm/handler.py:21-101`). The reference's
    // RhythmInt appends one period value at every time-signature change,
    // computed from the CUMULATIVE duration histogram and cumulative
    // sounding beats of strictly-earlier measures — duration-weighted
    // (`float(i)*j`) at mid-score boundaries but count/duration (`j/i`,
    // zero-guarded) at the final flush: the reference's two-formula quirk is
    // reproduced verbatim. AverageDuration is the mean over NONZERO
    // durations (`handler.py:85-95`). Analog domain: minutes = measures,
    // 5-minute blocks = time-signature periods (tsig changes at each block
    // start, so the first block's boundary contributes the guard's 0),
    // duration = pmod(event_id, 8)/2 quarter-lengths (includes exact zeros
    // to exercise both guards). One scan: per-minute partial sums roll up
    // through blocks; the cumulative window runs over users x blocks only.
    "q81_rhythm_intensity" -> ((s, dir) => {
      val perMin = t(s, dir, "events")
        .withColumn("dur", pmod(col("event_id"), lit(8)) / 2.0)
        .groupBy(col("user_id"), date_trunc("minute", col("ts")).as("measure"))
        .agg(
          sum(col("dur")).as("dsum"),
          sum(when(col("dur") =!= 0.0, lit(1.0) / col("dur")).otherwise(0.0)).as("invsum"),
          sum(when(col("dur") =!= 0.0, col("dur"))).as("nzsum"),
          sum(when(col("dur") =!= 0.0, 1L).otherwise(0L)).as("nzcnt"))
        .withColumn("blk", (unix_timestamp(col("measure")) / 300).cast("long"))
        .withColumn("tsig", element_at(typedLit(HrTimeSigs),
          (pmod(col("blk"), lit(HrTimeSigs.size)) + 1).cast("int")))
        .withColumn("num", split(col("tsig"), "/").getItem(0).cast("int"))
        .withColumn("beats", MusicTheory.beatsPerMeasure(col("num"), lit(4)).cast("int"))
      val perBlk = perMin.groupBy(col("user_id"), col("blk"))
        .agg(sum(col("dsum")).as("dsum"), sum(col("invsum")).as("invsum"),
          sum(col("beats")).cast("long").as("beats"),
          sum(col("nzsum")).as("nzsum"), sum(col("nzcnt")).as("nzcnt"))
      val wCum = Window.partitionBy(col("user_id")).orderBy(col("blk"))
        .rowsBetween(Window.unboundedPreceding, -1)
      perBlk
        .withColumn("cum_dsum", sum(col("dsum")).over(wCum))
        .withColumn("cum_beats", sum(col("beats")).over(wCum))
        .withColumn("pval",
          when(col("cum_beats") > 0, col("cum_dsum") / col("cum_beats")).otherwise(0.0))
        .groupBy(col("user_id"))
        .agg(
          r6(when(sum(col("nzcnt")) > 0, sum(col("nzsum")) / sum(col("nzcnt"))))
            .as("avg_duration"),
          r6(sum(col("pval")) + sum(col("invsum")) / sum(col("beats")))
            .as("rhythm_int"))
    }))

  private val sqlW = "PARTITION BY user_id ORDER BY ts, event_id"

  val oracles: Map[String, String] = Map(
    "q108_tie_merge" ->
      """WITH b AS (
        | SELECT user_id, ts, event_id, event_type, value,
        |  CASE (event_id % 5) WHEN 1 THEN 'start' WHEN 2 THEN 'continue'
        |    WHEN 3 THEN 'stop' WHEN 4 THEN '-' END AS tie,
        |  ((event_id % 8) + 1) / 2.0 AS duration
        | FROM events),
        |h AS (
        | SELECT *, CASE WHEN tie IS NULL OR tie NOT IN ('continue', 'stop')
        |    OR row_number() OVER (PARTITION BY user_id
        |         ORDER BY ts, event_id) = 1
        |   THEN 1 ELSE 0 END AS is_head
        | FROM b),
        |c AS (
        | SELECT *, sum(is_head) OVER (PARTITION BY user_id
        |   ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS chain_id
        | FROM h)
        |SELECT user_id, chain_id::BIGINT AS chain_id,
        | max(CASE WHEN is_head = 1 THEN event_type END) AS event_type,
        | round(max(CASE WHEN is_head = 1 THEN value END) + 3.7e-10, 6) AS value,
        | round(sum(duration) + 3.7e-10, 4) AS duration,
        | count(*)::BIGINT AS chain_len
        |FROM c GROUP BY 1, 2""".stripMargin,

    "q20_lag_delta" ->
      s"""SELECT event_id, user_id, round(value + 3.7e-10, 6) AS value,
         | round(value - lag(value) OVER ($sqlW) + 3.7e-10, 6) AS delta
         |FROM events""".stripMargin,

    "q21_backfill" ->
      s"""SELECT event_id, user_id,
         | round(last_value(CASE WHEN event_type IN ('click','purchase') THEN value END
         |   IGNORE NULLS) OVER ($sqlW ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + 3.7e-10, 6)
         |   AS v_filled
         |FROM events""".stripMargin,

    "q22_sessionize" ->
      s"""WITH flagged AS (
         | SELECT user_id, ts, value,
         |  CASE WHEN lag(ts) OVER ($sqlW) IS NULL
         |    OR ${sqlEpoch("ts")} - ${sqlEpoch(s"lag(ts) OVER ($sqlW)")} > 1800
         |   THEN 1 ELSE 0 END AS is_new
         | FROM events),
         |sess AS (
         | SELECT user_id, ts, value,
         |  sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS session_id
         | FROM flagged)
         |SELECT user_id, session_id::BIGINT AS session_id, count(*)::BIGINT AS n_events,
         | round(sum(value) + 3.7e-10, 4) AS sum_value,
         | (max(${sqlEpoch("ts")}) - min(${sqlEpoch("ts")}))::BIGINT AS duration_sec
         |FROM sess GROUP BY user_id, session_id""".stripMargin,

    "q23_rolling_mean" ->
      s"""SELECT event_id, user_id,
         | round(avg(value) OVER ($sqlW ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) + 3.7e-10, 6) AS rmean
         |FROM events""".stripMargin,

    "q24_diff_chain" ->
      s"""WITH d AS (
         | SELECT user_id, (value - lag(value) OVER ($sqlW)) / 1.0 AS speed, ts, event_id
         | FROM events),
         |d2 AS (
         | SELECT user_id, speed, (speed - lag(speed) OVER ($sqlW)) / 1.0 AS accel
         | FROM d)
         |SELECT user_id, count(*)::BIGINT AS n,
         | round(avg(abs(speed)) + 3.7e-10, 6) AS avg_abs_speed,
         | round(avg(abs(accel)) + 3.7e-10, 6) AS avg_abs_accel
         |FROM d2 GROUP BY user_id""".stripMargin,

    "q25_compress" ->
      s"""SELECT user_id, count(*)::BIGINT AS n_runs FROM (
         | SELECT user_id,
         |  CASE WHEN lag(event_type) OVER ($sqlW) IS NULL
         |    OR lag(event_type) OVER ($sqlW) <> event_type THEN 1 ELSE 0 END AS flag
         | FROM events)
         |WHERE flag = 1 GROUP BY user_id""".stripMargin,

    "q26_run_segments" ->
      s"""WITH flagged AS (
         | SELECT user_id, event_type, ts, event_id,
         |  CASE WHEN lag(event_type) OVER ($sqlW) IS NULL
         |    OR lag(event_type) OVER ($sqlW) <> event_type THEN 1 ELSE 0 END AS chg
         | FROM events),
         |seg AS (
         | SELECT user_id, event_type,
         |  sum(chg) OVER ($sqlW ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS segment_id
         | FROM flagged),
         |per_seg AS (
         | SELECT user_id, event_type, segment_id, count(*) AS seg_len
         | FROM seg GROUP BY 1, 2, 3),
         |per_key AS (
         | SELECT user_id, event_type, count(*)::BIGINT AS n_segments,
         |  avg(seg_len) AS avg_run_len
         | FROM per_seg GROUP BY 1, 2),
         |tot AS (SELECT user_id, count(*) AS nseg_total FROM per_seg GROUP BY 1)
         |SELECT p.user_id, p.event_type, p.n_segments,
         | round(p.n_segments / t.nseg_total + 3.7e-10, 6) AS seg_share,
         | round(p.avg_run_len + 3.7e-10, 6) AS avg_run_len
         |FROM per_key p JOIN tot t ON p.user_id = t.user_id""".stripMargin,

    "q27_tumbling" ->
      s"""SELECT user_id,
         | (floor(${sqlEpoch("ts")} / 21600) * 21600)::BIGINT AS wstart_sec,
         | count(*)::BIGINT AS n, round(sum(value) + 3.7e-10, 4) AS sum_value
         |FROM events GROUP BY 1, 2""".stripMargin,

    "q28_sliding_measure" ->
      s"""WITH r AS (
         | SELECT user_id, value,
         |  row_number() OVER ($sqlW) - 1 AS rn0
         | FROM events),
         |x AS (
         | SELECT user_id, value,
         |  unnest(generate_series(
         |    greatest(0, CAST(ceil((rn0 - 10 + 1) / 5.0) AS BIGINT)),
         |    rn0 // 5)) AS window_id
         | FROM r)
         |SELECT user_id, window_id::BIGINT AS window_id, count(*)::BIGINT AS n,
         | round(avg(value) + 3.7e-10, 6) AS avg_value
         |FROM x GROUP BY 1, 2""".stripMargin,

    "q29_first_rank" ->
      s"""WITH firsts AS (
         | SELECT user_id, event_type, event_id, ts FROM (
         |  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
         |    ORDER BY ts, event_id) AS rn FROM events)
         | WHERE rn = 1)
         |SELECT user_id, event_type, event_id,
         | row_number() OVER ($sqlW)::BIGINT AS pos
         |FROM firsts""".stripMargin,

    "q30_weighted_scan" ->
      s"""WITH e AS (
         | SELECT user_id, value,
         |  lag(value) OVER ($sqlW) AS prev_v,
         |  ${sqlEpoch("ts")} - ${sqlEpoch(s"lag(ts) OVER ($sqlW)")} AS dt,
         |  ${sqlEpoch(s"lead(ts) OVER ($sqlW)")} - ${sqlEpoch("ts")} AS dur_next
         | FROM events)
         |SELECT user_id,
         | round(avg(abs(value - prev_v) / greatest(dt, 1)) + 3.7e-10, 6) AS dyn_grad,
         | round(CASE WHEN sum(dur_next) <> 0 AND sum(dur_next) IS NOT NULL
         |   THEN sum(value * dur_next) / sum(dur_next) ELSE 0 END + 3.7e-10, 6) AS dyn_mean_weighted,
         | round(avg(value) + 3.7e-10, 6) AS dyn_mean
         |FROM e GROUP BY user_id""".stripMargin,

    "q32_dotted_rhythm" ->
      s"""WITH e AS (
         | SELECT user_id, event_id, value, date_trunc('minute', ts) AS minute,
         |  lead(date_trunc('minute', ts)) OVER ($sqlW) AS next_minute,
         |  lead(value) OVER ($sqlW) AS next_value
         | FROM events),
         |f AS (
         | SELECT user_id, minute,
         |  CASE WHEN (event_id % 4 = 0) AND next_minute = minute
         |    AND next_value < value THEN 1 ELSE 0 END AS dot,
         |  CASE WHEN (event_id % 4 = 0) AND next_minute = minute
         |    AND next_value < value AND (event_id % 8 = 0) THEN 1 ELSE 0 END AS ddot
         | FROM e),
         |m AS (
         | SELECT user_id, minute, sum(dot) AS n_dot, sum(ddot) AS n_ddot
         | FROM f GROUP BY 1, 2)
         |SELECT user_id,
         | round(sum(n_dot)::DOUBLE / count(*) + 3.7e-10, 6) AS dotted_per_active_minute,
         | round(sum(n_ddot)::DOUBLE /
         |   (date_diff('minute', min(minute), max(minute)) + 1) + 3.7e-10, 6) AS ddot_per_span_minute
         |FROM m GROUP BY 1""".stripMargin,

    "q33_harmonic_rhythm" ->
      s"""WITH m AS (
         | SELECT user_id, date_trunc('minute', ts) AS measure, count(*) AS n_chords
         | FROM events GROUP BY 1, 2),
         |t AS (
         | SELECT *,
         |  (['4/4','6/8','3/4','9/8','12/8'])[((${sqlEpoch("measure")} // 60) % 5)::INT + 1] AS tsig
         | FROM m),
         |b AS (
         | SELECT *, CASE WHEN num > 3 AND num % 3 = 0 THEN num // 3 ELSE num END AS beats
         | FROM (SELECT *, string_split(tsig, '/')[1]::INT AS num FROM t))
         |SELECT user_id,
         | round(sum(n_chords)::DOUBLE / count(*) + 3.7e-10, 6) AS harmonic_rhythm,
         | round(sum(n_chords)::DOUBLE / sum(beats) + 3.7e-10, 6) AS harmonic_rhythm_beats
         |FROM b GROUP BY 1""".stripMargin,

    "q81_rhythm_intensity" ->
      s"""WITH d AS (
         | SELECT user_id, date_trunc('minute', ts) AS measure,
         |  (event_id % 8) / 2.0 AS dur
         | FROM events),
         |m AS (
         | SELECT user_id, measure, sum(dur) AS dsum,
         |  sum(CASE WHEN dur <> 0 THEN 1.0 / dur ELSE 0 END) AS invsum,
         |  sum(CASE WHEN dur <> 0 THEN dur END) AS nzsum,
         |  sum(CASE WHEN dur <> 0 THEN 1 ELSE 0 END)::BIGINT AS nzcnt
         | FROM d GROUP BY 1, 2),
         |t AS (
         | SELECT *, (${sqlEpoch("measure")} // 300) AS blk,
         |  (['4/4','6/8','3/4','9/8','12/8'])[((${sqlEpoch("measure")} // 300) % 5)::INT + 1] AS tsig
         | FROM m),
         |b AS (
         | SELECT *, CASE WHEN num > 3 AND num % 3 = 0 THEN num // 3 ELSE num END AS beats
         | FROM (SELECT *, string_split(tsig, '/')[1]::INT AS num FROM t)),
         |g AS (
         | SELECT user_id, blk, sum(dsum) AS dsum, sum(invsum) AS invsum,
         |  sum(beats)::BIGINT AS beats, sum(nzsum) AS nzsum, sum(nzcnt)::BIGINT AS nzcnt
         | FROM b GROUP BY 1, 2),
         |c AS (
         | SELECT *,
         |  sum(dsum) OVER (PARTITION BY user_id ORDER BY blk
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cum_dsum,
         |  sum(beats) OVER (PARTITION BY user_id ORDER BY blk
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cum_beats
         | FROM g)
         |SELECT user_id,
         | round(CASE WHEN sum(nzcnt) > 0 THEN sum(nzsum) / sum(nzcnt) END + 3.7e-10, 6)
         |   AS avg_duration,
         | round(sum(CASE WHEN cum_beats > 0 THEN cum_dsum / cum_beats ELSE 0 END)
         |   + sum(invsum) / sum(beats) + 3.7e-10, 6) AS rhythm_int
         |FROM c GROUP BY 1""".stripMargin)
}
