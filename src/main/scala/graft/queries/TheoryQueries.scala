package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{Dims, LexMax, MusicTheory}
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

  /** Canonical undirected interval-name domain for q44's per-name counts
    * (0..12 semitones; wider leaps fall into "other"). */
  private val IntervalNameDomain = Seq("P1", "m2", "M2", "m3", "M3", "P4",
    "d5", "P5", "m6", "M6", "m7", "M7", "P8", "other")

  /** Count-column name per interval name — m/M differ only by case, which
    * collides under Spark's case-insensitive resolution, so minor -> min,
    * major -> maj. */
  private def ivCol(nm: String): String = nm.head match {
    case 'm' if nm != "other" => s"iv_min${nm.tail}"
    case 'M'                  => s"iv_maj${nm.tail}"
    case _                    => s"iv_$nm"
  }

  /** Deterministic mark/tempo-word domains for q31: every dynamic mark plus
    * a tempo-word mix covering base words, derivatives, the "A tempo"/"Con
    * brio"/"Giusto" specials, and an unmatched word (left-join null path). */
  private val MarkDomain = Dims.DynamicLevels.map(_._1)
  private val TempoWordDomain = Seq("allegro", "adagietto", "andante",
    "largo", "presto", "vivacissimo", "tempo", "brio", "giusto",
    "sostenuto", "cantabile", "marcia_funebre")

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
    }),

    // A7 extension: tempo/dynamics BROADCAST dimension lookups (J6 shape)
    // feeding the ordered-dynamics aggregate — the reference's
    // DYNAMIC_VALUES + tempo-word grouping as literal dim tables
    "q31_tempo_dynamics" -> ((s, dir) => {
      val e = t(s, dir, "events").select(
        col("user_id"),
        element_at(typedLit(MarkDomain),
          (pmod(col("event_id"), lit(MarkDomain.size)) + 1).cast("int")).as("mark"),
        element_at(typedLit(TempoWordDomain),
          (pmod(col("event_id"), lit(TempoWordDomain.size)) + 1).cast("int")).as("tempo_word"))
      val joined = e
        .join(broadcast(Dims.dynamicsDim(s)), Seq("mark"), "left")
        .join(broadcast(Dims.tempoDim(s)), Seq("tempo_word"), "left")
      joined.groupBy(col("user_id")).agg(
        r6(avg(col("level"))).as("dyn_mean"),
        sum(when(col("tempo_group_2") === "Slow", 1).otherwise(0)).cast("bigint").as("n_slow"),
        sum(when(col("tempo_group_2") === "Moderate", 1).otherwise(0)).cast("bigint").as("n_moderate"),
        sum(when(col("tempo_group_2") === "Fast", 1).otherwise(0)).cast("bigint").as("n_fast"),
        sum(when(col("tempo_group_2").isNull || col("tempo_group_2") === "NA", 1)
          .otherwise(0)).cast("bigint").as("n_other"))
    }),

    // F5 completion: chord-label parsing + chord-type classing + the
    // first-function of the PARSED chord in the local key's mode
    // (`harmony/utils.py:503-546`)
    "q46_chord_parse" -> ((s, dir) => {
      val base = t(s, dir, "events").select(
        col("event_id"),
        element_at(typedLit(ChordDomain),
          (pmod(col("event_id"), lit(ChordDomain.size)) + 1).cast("int")).as("chord"),
        element_at(typedLit(ChordTypeDomain),
          (pmod(col("event_id"), lit(ChordTypeDomain.size)) + 1).cast("int")).as("ctype"),
        element_at(typedLit(LocalKeyDomain),
          (pmod(col("user_id"), lit(LocalKeyDomain.size)) + 1).cast("int")).as("lk"))
      base.select(
        col("event_id"), col("chord"), col("ctype"), col("lk"),
        MusicTheory.parseChord(col("chord")).as("chord_root"),
        MusicTheory.chordTypeClass(col("ctype")).as("chord_class"),
        MusicTheory.harmonicFunction(MusicTheory.parseChord(col("chord")),
          MusicTheory.localKeyMode(col("lk"))).as("first_function"))
    }),

    // A14: the melody-battery interval analysis over the event stream —
    // per-user interval taxonomy (repeated/stepwise/leap, asc/desc with
    // percentages), per-name counts over the canonical spelling domain,
    // largest/smallest semitones, and the reference's
    // Interval(round(mean(abs)))-style mean-interval name
    // (`melody/handler.py:129-230`)
    "q44_melody_battery" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val iv = t(s, dir, "events")
        .withColumn("prev", lag(col("value"), 1).over(w))
        .where(col("prev").isNotNull)
        .withColumn("st", round(col("value") - col("prev"), 0).cast("int"))
        .withColumn("iname",
          when(abs(col("st")) <= 12,
            MusicTheory.intervalNameFromSemitones(abs(col("st")))).otherwise("other"))
      val nameCounts = IntervalNameDomain.map(nm =>
        sum(when(col("iname") === nm, 1).otherwise(0)).cast("bigint").as(ivCol(nm)))
      val n = count(lit(1)).cast("double")
      val aggs: Seq[org.apache.spark.sql.Column] = Seq(
        count(lit(1)).cast("bigint").as("n_intervals"),
        sum(when(col("st") > 0, 1).otherwise(0)).cast("bigint").as("n_asc"),
        sum(when(col("st") < 0, 1).otherwise(0)).cast("bigint").as("n_desc"),
        sum(when(col("st") === 0, 1).otherwise(0)).cast("bigint").as("n_repeated"),
        sum(when(abs(col("st")).isin(1, 2), 1).otherwise(0)).cast("bigint").as("n_stepwise"),
        sum(when(abs(col("st")) >= 3, 1).otherwise(0)).cast("bigint").as("n_leaps"),
        r6(sum(when(col("st") > 0, 1).otherwise(0)) / n).as("pct_asc"),
        r6(sum(when(col("st") < 0, 1).otherwise(0)) / n).as("pct_desc"),
        max(col("st")).as("largest_st"),
        min(col("st")).as("smallest_st"),
        avg(abs(col("st"))).as("__mean_abs")) ++ nameCounts
      iv.groupBy(col("user_id")).agg(aggs.head, aggs.tail: _*)
        .withColumn("mean_interval",
          MusicTheory.intervalNameFromSemitones(round(col("__mean_abs"), 0).cast("int")))
        .drop("__mean_abs")
    }),

    // W1/F1 second half: directed interval names + quality/size classes
    // from (semitones, steps) pairs derived deterministically from events —
    // the offset domain (-3..3) sweeps dd..AA for major-type intervals and
    // overflows the perfect range (-> NULL) at the edges
    "q43_interval_names" -> ((s, dir) => {
      val base = t(s, dir, "events").select(
        col("event_id"),
        (pmod(col("event_id"), lit(17)) - 8).cast("int").as("steps"),
        (pmod(col("user_id"), lit(7)) - 3).cast("int").as("qoff"))
      val withSemis = base.withColumn("semitones",
        (when(col("steps") < 0, lit(-1)).otherwise(lit(1)) *
          (MusicTheory.perfectMajorSemitones(col("steps")) + col("qoff"))).cast("int"))
      val named = withSemis.withColumn("iname",
        MusicTheory.intervalName(col("semitones"), col("steps")))
      named.select(
        col("event_id"), col("steps"), col("semitones"), col("iname"),
        MusicTheory.intervalQualityClass(col("iname")).as("quality_class"),
        MusicTheory.intervalSizeClass(col("steps")).as("size_class"),
        MusicTheory.withinOctave(col("semitones")).as("within_octave"))
    }),

    // A14 motion battery: analogs of music21's native (jSymbolic-derived)
    // melodic-motion extractors run by the reference's music21 handler
    // (`music21/handler.py:15-57` -> m21.features.native featureExtractors):
    // ChromaticMotion / StepwiseMotion / AmountOfArpeggiation fractions over
    // ALL melodic intervals, DirectionOfMotion = rising/(rising+falling),
    // and Duration-/SizeOfMelodicArcs over maximal same-sign interval runs.
    // Arc runs are a per-entity ordered scan (lag sign change -> running
    // sum), the same high-cardinality window shape as the flagship — one
    // exchange on user_id feeds both aggregate branches, and the final join
    // of the two per-user aggregates reuses that partitioning.
    "q70_melodic_motion" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val iv = t(s, dir, "events")
        .withColumn("prev", lag(col("value"), 1).over(w))
        .where(col("prev").isNotNull)
        .withColumn("st", round(col("value") - col("prev"), 0).cast("int"))
      val n = count(lit(1)).cast("double")
      val overall = iv.groupBy(col("user_id")).agg(
        count(lit(1)).cast("bigint").as("n_intervals"),
        r6(sum(when(abs(col("st")) === 1, 1).otherwise(0)) / n).as("pct_chromatic"),
        r6(sum(when(abs(col("st")).isin(1, 2), 1).otherwise(0)) / n).as("pct_stepwise"),
        r6(sum(when(abs(col("st")).isin(0, 3, 4, 7, 10, 11, 12, 15, 16), 1)
          .otherwise(0)) / n).as("pct_arpeggiation"),
        sum(when(col("st") > 0, 1).otherwise(0)).cast("bigint").as("n_rising"),
        sum(when(col("st") < 0, 1).otherwise(0)).cast("bigint").as("n_falling"))
        .withColumn("direction_ratio",
          when(col("n_rising") + col("n_falling") === 0, lit(0.0)).otherwise(
            r6(col("n_rising") / (col("n_rising") + col("n_falling")).cast("double"))))
      val nz = iv.where(col("st") =!= 0)
        .withColumn("sgn", when(col("st") > 0, 1).otherwise(-1))
      val runs = nz
        .withColumn("chg", when(lag(col("sgn"), 1).over(w).isNull
          || lag(col("sgn"), 1).over(w) =!= col("sgn"), 1).otherwise(0))
        .withColumn("run_id",
          sum(col("chg")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val arcAgg = runs.groupBy(col("user_id"), col("run_id"))
        .agg(count(lit(1)).as("arc_len"), abs(sum(col("st"))).as("arc_span"))
        .groupBy(col("user_id")).agg(
          count(lit(1)).cast("bigint").as("n_arcs"),
          r6(avg(col("arc_len"))).as("arc_len_mean"),
          r6(avg(col("arc_span"))).as("arc_span_mean"))
      overall.join(arcAgg, Seq("user_id"), "left")
        .na.fill(0L, Seq("n_arcs")).na.fill(0.0, Seq("arc_len_mean", "arc_span_mean"))
        .select(col("user_id"), col("n_intervals"), col("pct_chromatic"),
          col("pct_stepwise"), col("pct_arpeggiation"), col("n_rising"),
          col("n_falling"), col("direction_ratio"), col("n_arcs"),
          col("arc_len_mean"), col("arc_span_mean"))
    }),

    // A14 completion: the interval TYPE battery — per-quality x direction
    // counts/shares plus ascending/descending intervallic stats, the analog
    // of `melody/handler.py:329-470` (get_interval_type_features) and
    // :133-240 (ascending/descending stats of get_interval_features).
    // Same per-row (steps, qoff) domain as q43 (the dd..AA sweep); rows
    // whose quality overflows the perfect range are dropped (the reference
    // raises on unnameable intervals). Direction is the semitone sign
    // (`handler.py:564-570`), so repeated-number intervals (A1 etc.) still
    // direction-class. The quality class comes from the small (perf, diff)
    // arithmetic rather than building and re-parsing the directed-name
    // STRING: the name round-trip is already oracled by q43, and inlining
    // its giant expression tree here would get duplicated into every one of
    // the ~30 aggregate predicates by projection collapse (measured 3.4 s
    // -> the arithmetic form is ~7x cheaper). ONE narrow projection + ONE
    // hash aggregate — no window, partial agg applies, nothing keyed below
    // user_id, so the plan is a straight map-side-combine at any scale.
    "q72_interval_types" -> ((s, dir) => {
      val base = t(s, dir, "events").select(
        col("user_id"),
        (pmod(col("event_id"), lit(17)) - 8).cast("int").as("steps"),
        (pmod(col("user_id"), lit(7)) - 3).cast("int").as("qoff"))
      val derived = base
        .withColumn("g", (abs(col("steps")) + 1).cast("int"))
        .withColumn("s0", pmod(col("g") - 1, lit(7)))
        .withColumn("expected",
          MusicTheory.perfectMajorSemitones(col("steps")))
        .withColumn("semitones",
          (when(col("steps") < 0, lit(-1)).otherwise(lit(1)) *
            (col("expected") + col("qoff"))).cast("int"))
        .withColumn("diff", abs(col("semitones")) - col("expected"))
        .withColumn("perf", col("s0").isin(0, 3, 4))
      // qc/sc carried as SMALL INT codes (Q72Quals index / 0=repeated,
      // 1=stepwise, 2=leap): the 55 conditional sums below compare these
      // per buffer update, and with string codes the generated equality
      // calls alone pushed the aggregate method past janino's 64 KB limit
      def qcCode(name: String): Int = Q72Quals.indexWhere(_._1 == name)
      val qc = when(col("perf"),
          when(col("diff") === 0, qcCode("perfect"))
            .when(col("diff") === 1, qcCode("augmented"))
            .when(col("diff") === 2, qcCode("double_augmented"))
            .when(col("diff") === -1, qcCode("diminished"))
            .when(col("diff") === -2, qcCode("double_diminished")))
        .otherwise(
          when(col("diff") === 0, qcCode("major"))
            .when(col("diff") === -1, qcCode("minor"))
            .when(col("diff") === 1, qcCode("augmented"))
            .when(col("diff") === 2, qcCode("double_augmented"))
            .when(col("diff") === -2, qcCode("diminished"))
            .when(col("diff") === -3, qcCode("double_diminished")))
      val iv = derived.withColumn("qc", qc).where(col("qc").isNotNull).select(
        col("user_id"), col("semitones"), col("qc"),
        when(col("g") === 1, 0).when(col("g") === 2, 1)
          .otherwise(2).as("sc"),
        (abs(col("semitones")) <= 12).as("wo"))
      // TWO chained hash aggregates (the q63/q82 shape): the previous
      // single 55-aggregate battery ran the WHOLE event stream through one
      // update method that janino refuses ("Code grows beyond 64 KB" —
      // avg/stddev Welford buffers × wide predicates; splitAggregateFunc
      // can't rescue it), so the full scan fell back to interpreted eval.
      // Phase 1 rolls the stream up to ≤ |qc|·|sc|·2·3 cells per user
      // carrying (count, Σs, Σs², min, max) — small enough to stay inside
      // whole-stage codegen, and it is the only operator that touches
      // event-stream volume. Phase 2 is plain conditional SUMS over the
      // bounded cells (mean/std derived post-agg from the power sums —
      // exact: semitones are small ints, so Σs/Σs² are exact integers in
      // double, and r6's epsilon absorbs the last-bit difference vs a
      // streaming stddev); its 43 buffers still exceed the 64 KB method
      // limit, but the interpreted fallback now runs over ≤126 rows per
      // user instead of every event — immaterial at any scale.
      val cells = iv.groupBy(col("user_id"), col("qc"), col("sc"), col("wo"),
          signum(col("semitones")).cast("int").as("dir"))
        .agg(count(lit(1)).as("c"),
          sum(col("semitones")).as("s"),
          sum(col("semitones") * col("semitones")).as("ss"),
          max(col("semitones")).as("mx"),
          min(col("semitones")).as("mn"))
      val asc = col("dir") === 1
      val desc = col("dir") === -1
      val n = sum(col("c")).cast("double")
      def cnt(cond: Column) =
        coalesce(sum(when(cond, col("c"))), lit(0L)).cast("bigint")
      def triple(pre: String, cond: Column) = Seq(
        cnt(cond && asc).as(s"${pre}_asc"),
        cnt(cond && desc).as(s"${pre}_desc"),
        cnt(cond).as(s"${pre}_all"),
        r6(cnt(cond) / n).as(s"${pre}_per"))
      val qualAggs = Q72Quals.zipWithIndex.flatMap { case ((_, pre), code) =>
        triple(pre, col("qc") === code)
      }
      def dirStat(pre: String, cond: Column) = {
        val cN = coalesce(sum(when(cond, col("c"))), lit(0L)).cast("double")
        val sS = coalesce(sum(when(cond, col("s"))), lit(0L)).cast("double")
        val sSS = coalesce(sum(when(cond, col("ss"))), lit(0L)).cast("double")
        Seq(
          r6(when(cN > 0, sS / cN).otherwise(0.0)).as(s"${pre}_mean"),
          r6(when(cN >= 2,
            sqrt(greatest(lit(0.0), (sSS - sS * sS / cN) / (cN - 1))))
            .otherwise(0.0)).as(s"${pre}_std"),
          coalesce(sum(when(cond, col("s"))), lit(0L)).cast("bigint")
            .as(s"${pre}_semi_sum"))
      }
      val aggs: Seq[Column] =
        Seq(sum(col("c")).cast("bigint").as("n_intervals"),
          cnt(col("sc") === 0).as("rep_all"),
          r6(cnt(col("sc") === 0) / n).as("rep_per")) ++
        triple("stw", col("sc") === 1) ++
        triple("leap", col("sc") === 2) ++
        triple("within_oct", col("wo")) ++
        triple("beyond_oct", !col("wo")) ++
        qualAggs ++
        dirStat("asc", asc) ++ dirStat("desc", desc) ++
        Seq(max(when(asc, col("mx"))).as("largest_asc_semi"),
          min(when(desc, col("mn"))).as("largest_desc_semi"))
      cells.groupBy(col("user_id")).agg(aggs.head, aggs.tail: _*)
    }),

    // F5/harmony completion: chord-additions classing
    // (`/root/reference/musif/extract/features/harmony/utils.py:380-419`):
    // the "changes" annotation is bucketed exactly as the reference does —
    // "+9" exact; {4, 6, 64, 4.0, 6.0, 64.0} pooled; any other string
    // containing '+' = augmented-others; "nan" skipped; rest =
    // plain-others — and each bucket is reported as its share of TOTAL
    // chords (nan rows included in the denominator, faithful to
    // `/ total_chords`). One hash aggregate.
    "q76_chord_additions" -> ((s, dir) => {
      val base = t(s, dir, "events").select(
        col("user_id"),
        element_at(typedLit(ChangesDomain),
          (pmod(col("event_id"), lit(ChangesDomain.size)) + 1).cast("int")).as("chg"))
      val cls = when(col("chg") === "+9", "add_9")
        .when(col("chg").isin("4", "6", "64", "4.0", "6.0", "64.0"), "add_4_6_64")
        .when(col("chg").contains("+"), "others_aug")
        .when(col("chg") === "nan", lit(null: String))
        .otherwise("others_no_aug")
      val n = count(lit(1)).cast("double")
      def share(c: String) =
        r6(sum(when(col("cls") === c, 1).otherwise(0)) / n).as(s"${c}_share")
      base.withColumn("cls", cls).groupBy(col("user_id")).agg(
        count(lit(1)).cast("bigint").as("total_chords"),
        share("add_9"), share("add_4_6_64"),
        share("others_aug"), share("others_no_aug"))
    }),

    // Harmony numerals battery (`harmony/utils.py:341-362`): per-numeral
    // Count + Per over the piece, shares rounded to 3 decimals exactly as
    // the reference's `round(count/total, 3)`. Same Numerals domain as q42;
    // one hash aggregate, partial agg applies.
    "q77_numerals_battery" -> ((s, dir) => {
      val base = t(s, dir, "events").select(
        col("user_id"),
        element_at(typedLit(Numerals),
          (pmod(col("event_id"), lit(Numerals.size)) + 1).cast("int")).as("numeral"))
      val n = count(lit(1)).cast("double")
      val aggs: Seq[Column] =
        Seq(count(lit(1)).cast("bigint").as("total_numerals")) ++
        Numerals.flatMap { nm =>
          val c = sum(when(col("numeral") === nm, 1).otherwise(0))
          Seq(c.cast("bigint").as(s"num_${nm}_count"),
            round(c / n + lit(Q.TieEps), 3).as(s"num_${nm}_per"))
        }
      base.groupBy(col("user_id")).agg(aggs.head, aggs.tail: _*)
    }),

    // Melody interval-stats battery (`melody/handler.py:577-608`):
    // bias-corrected (scipy bias=False) skewness/kurtosis of the signed and
    // absolute interval streams, with the reference's guard — None unless
    // at least one interval is nonzero. Same lag-derived interval stream as
    // q44/q70; one window pass + one hash aggregate, the guard evaluated
    // post-aggregation from max(|st|).
    "q78_interval_moments" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val iv = t(s, dir, "events")
        .withColumn("prev", lag(col("value"), 1).over(w))
        .where(col("prev").isNotNull)
        .withColumn("st", round(col("value") - col("prev"), 0).cast("int"))
      val anyNz = max(abs(col("st"))) > 0
      iv.groupBy(col("user_id")).agg(
        count(lit(1)).cast("bigint").as("n_intervals"),
        when(anyNz, r6(graft.ops.Stats.skewnessCorrected(col("st")))).as("skew_st"),
        when(anyNz, r6(graft.ops.Stats.kurtosisCorrected(col("st")))).as("kurt_st"),
        when(anyNz, r6(graft.ops.Stats.skewnessCorrected(abs(col("st"))))).as("skew_abs"),
        when(anyNz, r6(graft.ops.Stats.kurtosisCorrected(abs(col("st"))))).as("kurt_abs"))
    }),

    // Trimmed intervallic family (`melody/handler.py:172-196`): scipy
    // positional trim (floor(0.1 n) per tail) of the SIGNED and ABSOLUTE
    // interval streams, with TrimDiff/TrimRatio — the melody-context
    // composition of the q05 machinery (Stats.trimmedStats two-phase exact
    // ranking) over the lag-derived stream. Ties rank by (ts, event_id);
    // equal values contribute identically so the rank tie-break never
    // changes the trimmed sums.
    "q79_interval_trim" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val iv = t(s, dir, "events")
        .withColumn("prev", lag(col("value"), 1).over(w))
        .where(col("prev").isNotNull)
        .withColumn("st", round(col("value") - col("prev"), 0).cast("int"))
        .select(col("user_id"), col("ts"), col("event_id"), col("st"),
          abs(col("st")).as("ast"))
      // stack the signed and absolute streams so ONE lag scan and ONE
      // two-phase trim chain (group key = user x metric) serve both sides —
      // the previous two-call formulation paid the entity window sort and
      // the trim chain twice; the stacked rank order per metric is
      // unchanged, so the scipy positional semantics are identical
      val stacked = iv.select(col("user_id"), col("ts"), col("event_id"),
        explode(map(lit("st"), col("st"), lit("abs"), col("ast")))
          .as(Seq("metric", "v")))
      val trimmed = graft.ops.Stats.trimmedStats(stacked,
        Seq("user_id", "metric"), "v", 0.1, Seq("ts", "event_id"))
      val stats = Seq("trimmed_mean", "trimmed_std", "trimmed_n",
        "trim_diff", "trim_ratio")
      val aggs = for { sfx <- Seq("st", "abs"); stc <- stats } yield {
        val v = max(when(col("metric") === sfx, col(stc)))
        (if (stc == "trimmed_n") v else r6(v)).as(s"${stc}_$sfx")
      }
      trimmed.groupBy(col("user_id")).agg(aggs.head, aggs.tail: _*)
    }),

    // A14 breadth: music21 native DURATION battery analog — unique-duration
    // count, most-common duration and its prevalence (the D-prefixed
    // music21 extractors run by `features/music21/handler.py:15-57`,
    // e.g. UniqueNoteQuarterLengths / MostCommonNoteQuarterLength /
    // MostCommonNoteQuarterLengthPrevalence). Deterministic tie-break:
    // highest count then SMALLEST duration, as ONE hash aggregate via the
    // native LexMax DeclarativeAggregate (no per-group sort — partial agg
    // applies, survives a low-cardinality group key at scale).
    "q82_duration_battery" -> ((s, dir) => {
      val counts = t(s, dir, "events")
        .withColumn("dur", pmod(col("event_id"), lit(8)) / 2.0)
        .groupBy(col("user_id"), col("dur"))
        .agg(count(lit(1)).as("cnt"))
      counts.groupBy(col("user_id"))
        .agg(
          count(lit(1)).cast("long").as("n_unique_durations"),
          sum(col("cnt")).cast("long").as("n_notes"),
          LexMax.lexMax(col("cnt"), -col("dur")).as("__m"),
          // QL4 RangeOfNoteQuarterLengths (exact halves -> exact double)
          (max(col("dur")) - min(col("dur"))).as("duration_range"))
        .select(col("user_id"), col("n_unique_durations"), col("n_notes"),
          (-col("__m.c1")).as("most_common_duration"),
          r6(col("__m.c0") / col("n_notes")).as("mc_prevalence"),
          col("duration_range"))
    }),

    // q109: SIMULTANEITY battery — the music21 native CS-family analog
    // (`music21/features/native.py` CS1-CS12, wrapped by the reference's
    // `features/music21/handler.py:15-57`): vertical sonorities = the
    // pc-set bit mask of each (entity, measure) bucket. Emits unique
    // pc-set count (CS1), unique Tn-set-class count via the min-of-12-
    // rotations canonical form (CS2 — transposition classes; music21's TnI
    // inversion fold is documented as out of scope in COVERAGE.md),
    // most-common pc-set / set-class prevalence (CS3/CS4), the named
    // triad/seventh class prevalences (CS5-CS10 over canonical forms), and
    // the 12-bin bass-motion histogram (CS12 analog: semitone delta of the
    // lowest pc between successive sonorities). Scale shape: two hash aggs
    // + one window over the measure-compressed table (|input|/measure_size
    // rows); the sonority table is staged once for its three consumers.
    "q109_simultaneity_battery" -> ((s, dir) => {
      val son = t(s, dir, "events")
        .select(col("user_id"),
          (unix_timestamp(col("ts")) / 60).cast("long").as("m"),
          pmod(col("event_id"), lit(12)).cast("int").as("pc"))
        .groupBy(col("user_id"), col("m"))
        .agg(expr("bit_or(shiftleft(1, pc))").as("mask"),
          min(col("pc")).as("bass"))
        .withColumn("canon",
          least((0 until 12).map(k =>
            (shiftright(col("mask"), k)
              .bitwiseOR(shiftleft(col("mask"), 12 - k)))
              .bitwiseAND(lit(4095))): _*))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val mk = son.groupBy(col("user_id"), col("mask"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).cast("long").as("n_unique_pc_sets"),
          sum(col("cnt")).cast("long").as("n_sonorities"),
          r6(max(col("cnt")).cast("double") / sum(col("cnt")))
            .as("mc_pcset_prevalence"))
      val prevs = SonorityClasses.map { case (name, canonVal) =>
        r6(sum(when(col("canon") === canonVal, col("cnt")).otherwise(lit(0L)))
          .cast("double") / sum(col("cnt"))).as(s"${name}_prev")
      }
      val ck = son.groupBy(col("user_id"), col("canon"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).cast("long").as("n_unique_set_classes"),
          (r6(max(col("cnt")).cast("double") / sum(col("cnt")))
            .as("mc_setclass_prevalence") +: prevs
            :+ r6(sum(when(col("canon").isin(TriadCanons: _*), col("cnt"))
              .otherwise(lit(0L))).cast("double") / sum(col("cnt")))
              .as("triad_prev")): _*)
      val w = Window.partitionBy(col("user_id")).orderBy(col("m"))
      val bmCols = (0 until 12).map(d =>
        sum(when(col("d") === d, 1L).otherwise(0L)).as(f"__bm$d%02d"))
      val mot = son
        .withColumn("prev", lag(col("bass"), 1).over(w))
        .where(col("prev").isNotNull)
        .withColumn("d", pmod(col("bass") - col("prev"), lit(12)))
        .groupBy(col("user_id"))
        .agg(bmCols.head, bmCols.tail: _*)
        .withColumn("__n", (0 until 12).map(d => col(f"__bm$d%02d")).reduce(_ + _))
      val bmShares = (0 until 12).map(d =>
        r6(coalesce(col(f"__bm$d%02d").cast("double") / col("__n"), lit(0.0)))
          .as(f"bm$d%02d"))
      mk.join(ck, Seq("user_id"))
        .join(mot, Seq("user_id"), "left")
        .select((Seq(col("user_id"), col("n_sonorities"),
          col("n_unique_pc_sets"), col("mc_pcset_prevalence"),
          col("n_unique_set_classes"), col("mc_setclass_prevalence")) ++
          SonorityClasses.map(c => col(s"${c._1}_prev")) :+ col("triad_prev"))
          ++ bmShares: _*)
    }))

  /** Tn-canonical form of a 12-bit pc-set mask: min over the 12 rotations
    * — ONE Scala function generates the Spark literals and the oracle's
    * constants (the FunnelSplitWeights single-source pattern). */
  private[queries] def canon12(mask: Int): Int =
    (0 until 12).map(k => ((mask >> k) | (mask << (12 - k))) & 4095).min

  /** Named sonority classes (music21 CS5-CS10) as canonical Tn masks:
    * major {0,4,7}, minor {0,3,7}, diminished {0,3,6}, dominant seventh
    * {0,4,7,10}, diminished seventh {0,3,6,9}; augmented {0,4,8} completes
    * the triad family for CS9. */
  private[queries] val SonorityClasses: Seq[(String, Int)] = Seq(
    "maj_triad" -> canon12(1 + 16 + 128),
    "min_triad" -> canon12(1 + 8 + 128),
    "dim_triad" -> canon12(1 + 8 + 64),
    "dom7" -> canon12(1 + 16 + 128 + 1024),
    "dim7" -> canon12(1 + 8 + 64 + 512))

  private[queries] val TriadCanons: Seq[Int] = Seq(
    canon12(1 + 16 + 128), canon12(1 + 8 + 128), canon12(1 + 8 + 64),
    canon12(1 + 16 + 256)) // + augmented for CS9's "any triad"

  /** Chord-"changes" domain for q76: the reference's exact-match token, the
    * 4/6/64 pool (string and float spellings), augmented and plain others,
    * and the skipped "nan". */
  private[queries] val ChangesDomain = Seq(
    "+9", "4", "6", "64", "6.0", "9", "+4", "11", "nan")

  /** quality_class -> output-column prefix for q72 (shared with the oracle
    * generator so both sides enumerate identically). */
  private[queries] val Q72Quals = Seq(
    "perfect" -> "perf", "major" -> "maj", "minor" -> "min",
    "augmented" -> "aug", "diminished" -> "dim",
    "double_augmented" -> "daug", "double_diminished" -> "ddim")

  /** Chord/label domains for q46 — cover every decoration branch of
    * parse_chord, every chord-type class, and both key-mode cases
    * (incl. the faithful "Bb".isupper() == false quirk). */
  private val ChordDomain = Seq("V7(9)", "viio7", "IV+6", "ii%43", "IM7",
    "V43", "i", "bVII64")
  private val ChordTypeDomain = Seq("m", "M", "7", "mm7", "o7", "%7", "+",
    "+M7", "weird")
  private val LocalKeyDomain = Seq("C", "c", "Bb", "f#", "G")

  // canonical-spelling CASE fragments for the q44 oracle, generated from the
  // same tables as MusicTheory.intervalNameFromSemitones
  private val CanonQ = Seq("P", "m", "M", "m", "M", "P", "d", "P", "m", "M", "m", "M")
  private val CanonN = Seq(1, 2, 2, 3, 3, 4, 5, 5, 6, 6, 7, 7)
  private def canonNameSql(e: String): String = {
    val q = "CASE (" + e + " % 12) " +
      CanonQ.zipWithIndex.map { case (c, i) => s"WHEN $i THEN '$c'" }.mkString(" ") + " END"
    val n = "(CASE (" + e + " % 12) " +
      CanonN.zipWithIndex.map { case (c, i) => s"WHEN $i THEN $c" }.mkString(" ") +
      s" END) + ($e // 12) * 7"
    s"($q) || (($n)::VARCHAR)"
  }

  val oracles: Map[String, String] = Map(
    "q109_simultaneity_battery" -> {
      val rots = (0 until 12).map(k =>
        s"((mask >> $k) | (mask << ${12 - k})) & 4095").mkString(",\n   ")
      val prevCases = SonorityClasses.map { case (name, cv) =>
        s"round(sum(CASE WHEN canon = $cv THEN cnt ELSE 0 END)::DOUBLE" +
          s" / sum(cnt) + 3.7e-10, 6) AS ${name}_prev"
      }.mkString(",\n  ")
      val triadIn = TriadCanons.mkString(", ")
      val bmSums = (0 until 12).map(d =>
        f"sum(CASE WHEN d = $d THEN 1 ELSE 0 END)::BIGINT AS bm$d%02d")
        .mkString(",\n  ")
      val bmOut = (0 until 12).map(d =>
        f"round(coalesce(mt.bm$d%02d::DOUBLE / nullif(mt.n, 0), 0)" +
          f" + 3.7e-10, 6) AS bm$d%02d").mkString(",\n ")
      s"""WITH e AS (
         | SELECT user_id, ${sqlEpoch("ts")} // 60 AS m,
         |  (event_id % 12)::INT AS pc
         | FROM events),
         |son AS (
         | SELECT user_id, m, bit_or((1 << pc)) AS mask, min(pc) AS bass
         | FROM e GROUP BY 1, 2),
         |c AS (
         | SELECT *, least(
         |   $rots) AS canon
         | FROM son),
         |mk0 AS (SELECT user_id, mask, count(*)::BIGINT AS cnt
         |        FROM c GROUP BY 1, 2),
         |mk AS (
         | SELECT user_id, count(*)::BIGINT AS n_unique_pc_sets,
         |  sum(cnt)::BIGINT AS n_sonorities,
         |  round(max(cnt)::DOUBLE / sum(cnt) + 3.7e-10, 6) AS mc_pcset_prevalence
         | FROM mk0 GROUP BY 1),
         |ck0 AS (SELECT user_id, canon, count(*)::BIGINT AS cnt
         |        FROM c GROUP BY 1, 2),
         |ck AS (
         | SELECT user_id, count(*)::BIGINT AS n_unique_set_classes,
         |  round(max(cnt)::DOUBLE / sum(cnt) + 3.7e-10, 6) AS mc_setclass_prevalence,
         |  $prevCases,
         |  round(sum(CASE WHEN canon IN ($triadIn) THEN cnt ELSE 0 END)::DOUBLE
         |    / sum(cnt) + 3.7e-10, 6) AS triad_prev
         | FROM ck0 GROUP BY 1),
         |mo AS (
         | SELECT user_id,
         |  ((bass - lag(bass) OVER (PARTITION BY user_id ORDER BY m)) % 12
         |    + 12) % 12 AS d
         | FROM c),
         |mt AS (
         | SELECT user_id, count(d)::BIGINT AS n,
         |  $bmSums
         | FROM mo GROUP BY 1)
         |SELECT mk.user_id, mk.n_sonorities, mk.n_unique_pc_sets,
         | mk.mc_pcset_prevalence, ck.n_unique_set_classes,
         | ck.mc_setclass_prevalence,
         | ${SonorityClasses.map(c => s"ck.${c._1}_prev").mkString(", ")},
         | ck.triad_prev,
         | $bmOut
         |FROM mk JOIN ck USING (user_id)
         |LEFT JOIN mt USING (user_id)""".stripMargin
    },

    "q82_duration_battery" ->
      """WITH d AS (
        | SELECT user_id, (event_id % 8) / 2.0 AS dur FROM events),
        |c AS (
        | SELECT user_id, dur, count(*)::BIGINT AS cnt FROM d GROUP BY 1, 2),
        |r AS (
        | SELECT *,
        |  row_number() OVER (PARTITION BY user_id ORDER BY cnt DESC, dur ASC) AS rn,
        |  count(*) OVER (PARTITION BY user_id) AS n_uniq,
        |  sum(cnt) OVER (PARTITION BY user_id) AS n_tot,
        |  max(dur) OVER (PARTITION BY user_id)
        |    - min(dur) OVER (PARTITION BY user_id) AS duration_range
        | FROM c)
        |SELECT user_id,
        | n_uniq::BIGINT AS n_unique_durations,
        | n_tot::BIGINT AS n_notes,
        | dur AS most_common_duration,
        | round(cnt / n_tot::DOUBLE + 3.7e-10, 6) AS mc_prevalence,
        | duration_range
        |FROM r WHERE rn = 1""".stripMargin,

    "q70_melodic_motion" ->
      """WITH iv0 AS (
        | SELECT user_id, ts, event_id, value,
        |  lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        | FROM events),
        |iv AS (
        | SELECT user_id, ts, event_id, round(value - prev)::INT AS st
        | FROM iv0 WHERE prev IS NOT NULL),
        |overall AS (
        | SELECT user_id,
        |  count(*)::BIGINT AS n_intervals,
        |  round(sum(CASE WHEN abs(st) = 1 THEN 1 ELSE 0 END)::DOUBLE / count(*) + 3.7e-10, 6) AS pct_chromatic,
        |  round(sum(CASE WHEN abs(st) IN (1, 2) THEN 1 ELSE 0 END)::DOUBLE / count(*) + 3.7e-10, 6) AS pct_stepwise,
        |  round(sum(CASE WHEN abs(st) IN (0, 3, 4, 7, 10, 11, 12, 15, 16) THEN 1 ELSE 0 END)::DOUBLE / count(*) + 3.7e-10, 6) AS pct_arpeggiation,
        |  sum(CASE WHEN st > 0 THEN 1 ELSE 0 END)::BIGINT AS n_rising,
        |  sum(CASE WHEN st < 0 THEN 1 ELSE 0 END)::BIGINT AS n_falling
        | FROM iv GROUP BY 1),
        |nz AS (
        | SELECT user_id, ts, event_id, st,
        |  CASE WHEN st > 0 THEN 1 ELSE -1 END AS sgn
        | FROM iv WHERE st <> 0),
        |chg AS (
        | SELECT *, CASE WHEN lag(sgn) OVER w IS NULL OR lag(sgn) OVER w <> sgn
        |   THEN 1 ELSE 0 END AS c
        | FROM nz WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |runs AS (
        | SELECT *, sum(c) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
        | FROM chg),
        |arcs AS (
        | SELECT user_id, run_id, count(*)::BIGINT AS arc_len,
        |  abs(sum(st))::BIGINT AS arc_span
        | FROM runs GROUP BY 1, 2),
        |arcagg AS (
        | SELECT user_id, count(*)::BIGINT AS n_arcs,
        |  round(avg(arc_len) + 3.7e-10, 6) AS arc_len_mean,
        |  round(avg(arc_span) + 3.7e-10, 6) AS arc_span_mean
        | FROM arcs GROUP BY 1)
        |SELECT o.user_id, o.n_intervals, o.pct_chromatic, o.pct_stepwise,
        | o.pct_arpeggiation, o.n_rising, o.n_falling,
        | CASE WHEN o.n_rising + o.n_falling = 0 THEN 0.0
        |   ELSE round(o.n_rising::DOUBLE / (o.n_rising + o.n_falling) + 3.7e-10, 6)
        | END AS direction_ratio,
        | coalesce(a.n_arcs, 0)::BIGINT AS n_arcs,
        | coalesce(a.arc_len_mean, 0.0) AS arc_len_mean,
        | coalesce(a.arc_span_mean, 0.0) AS arc_span_mean
        |FROM overall o LEFT JOIN arcagg a USING (user_id)""".stripMargin,

    "q46_chord_parse" -> {
      val chords = ChordDomain.map(c => s"'$c'").mkString(", ")
      val types = ChordTypeDomain.map(c => s"'$c'").mkString(", ")
      val keys = LocalKeyDomain.map(c => s"'$c'").mkString(", ")
      s"""WITH base AS (
         | SELECT event_id,
         |  ([$chords])[(event_id % ${ChordDomain.size})::INT + 1] AS chord,
         |  ([$types])[(event_id % ${ChordTypeDomain.size})::INT + 1] AS ctype,
         |  ([$keys])[(user_id % ${LocalKeyDomain.size})::INT + 1] AS lk
         | FROM events),
         |p AS (
         | SELECT *, regexp_extract(
         |   split_part(split_part(split_part(split_part(split_part(
         |     chord, '(', 1), 'o', 1), '+', 1), '%', 1), 'M', 1),
         |   '^([^0-9]*)', 1) AS chord_root,
         |  CASE WHEN upper(lk) = lk THEN 'M' ELSE 'm' END AS mode
         | FROM base)
         |SELECT event_id, chord, ctype, lk, chord_root,
         | CASE WHEN ctype = 'm' THEN 'minor triad'
         |   WHEN ctype = 'M' THEN 'mayor triad'
         |   WHEN ctype IN ('7', 'mm7', 'Mm7', 'MM7', 'mM7') THEN '7th'
         |   WHEN ctype IN ('o', 'o7', '%', '%7') THEN 'dim'
         |   WHEN ctype IN ('+', '+M7', '+m7') THEN 'aug'
         |   ELSE 'other' END AS chord_class,
         | CASE WHEN chord_root = 'vii' THEN 'D'
         |   WHEN chord_root = 'I' THEN 'T'
         |   WHEN chord_root = 'i' THEN 't'
         |   WHEN chord_root = 'ii' THEN 'sd'
         |   WHEN chord_root = 'IV' THEN 'SD'
         |   WHEN chord_root = 'V' THEN 'D'
         |   WHEN chord_root = 'bVII' THEN
         |     (CASE WHEN mode = 'M' THEN 'ST' ELSE 'bST' END)
         |   END AS first_function
         |FROM p""".stripMargin
    },

    "q44_melody_battery" -> {
      val nameCountSql = IntervalNameDomain.map(nm =>
        s"sum(CASE WHEN iname = '$nm' THEN 1 ELSE 0 END)::BIGINT AS ${ivCol(nm)}").mkString(",\n ")
      s"""WITH iv0 AS (
         | SELECT user_id, value,
         |  lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
         | FROM events),
         |iv AS (
         | SELECT user_id, round(value - prev)::INT AS st
         | FROM iv0 WHERE prev IS NOT NULL),
         |named AS (
         | SELECT *, CASE WHEN abs(st) > 12 THEN 'other'
         |   ELSE ${canonNameSql("abs(st)")} END AS iname
         | FROM iv),
         |g AS (
         | SELECT user_id,
         |  count(*)::BIGINT AS n_intervals,
         |  sum(CASE WHEN st > 0 THEN 1 ELSE 0 END)::BIGINT AS n_asc,
         |  sum(CASE WHEN st < 0 THEN 1 ELSE 0 END)::BIGINT AS n_desc,
         |  sum(CASE WHEN st = 0 THEN 1 ELSE 0 END)::BIGINT AS n_repeated,
         |  sum(CASE WHEN abs(st) IN (1, 2) THEN 1 ELSE 0 END)::BIGINT AS n_stepwise,
         |  sum(CASE WHEN abs(st) >= 3 THEN 1 ELSE 0 END)::BIGINT AS n_leaps,
         |  round(sum(CASE WHEN st > 0 THEN 1 ELSE 0 END)::DOUBLE / count(*) + 3.7e-10, 6) AS pct_asc,
         |  round(sum(CASE WHEN st < 0 THEN 1 ELSE 0 END)::DOUBLE / count(*) + 3.7e-10, 6) AS pct_desc,
         |  max(st) AS largest_st,
         |  min(st) AS smallest_st,
         |  round(avg(abs(st)))::INT AS mabs,
         |  $nameCountSql
         | FROM named GROUP BY 1)
         |SELECT * EXCLUDE (mabs), ${canonNameSql("mabs")} AS mean_interval
         |FROM g""".stripMargin
    },

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
        |FROM e""".stripMargin,

    "q31_tempo_dynamics" -> {
      val marks = MarkDomain.map(m => "'" + m.replace("'", "''") + "'").mkString(", ")
      val words = TempoWordDomain.map(w => s"'$w'").mkString(", ")
      s"""WITH dyn(mark, level) AS (VALUES ${Dims.dynamicsValuesSql}),
         |tempo(tempo_word, tempo_group_1, tempo_group_2) AS (VALUES ${Dims.tempoValuesSql}),
         |e AS (
         | SELECT user_id,
         |  ([$marks])[(event_id % ${MarkDomain.size})::INT + 1] AS mark,
         |  ([$words])[(event_id % ${TempoWordDomain.size})::INT + 1] AS tempo_word
         | FROM events),
         |j AS (
         | SELECT e.user_id, d.level, t.tempo_group_2
         | FROM e LEFT JOIN dyn d ON e.mark = d.mark
         |  LEFT JOIN tempo t ON e.tempo_word = t.tempo_word)
         |SELECT user_id, round(avg(level) + 3.7e-10, 6) AS dyn_mean,
         | sum(CASE WHEN tempo_group_2 = 'Slow' THEN 1 ELSE 0 END)::BIGINT AS n_slow,
         | sum(CASE WHEN tempo_group_2 = 'Moderate' THEN 1 ELSE 0 END)::BIGINT AS n_moderate,
         | sum(CASE WHEN tempo_group_2 = 'Fast' THEN 1 ELSE 0 END)::BIGINT AS n_fast,
         | sum(CASE WHEN tempo_group_2 IS NULL OR tempo_group_2 = 'NA' THEN 1 ELSE 0 END)::BIGINT AS n_other
         |FROM j GROUP BY 1""".stripMargin
    },

    "q43_interval_names" ->
      """WITH base AS (
        | SELECT event_id,
        |  ((event_id % 17) - 8)::INT AS steps,
        |  ((user_id % 7) - 3)::INT AS qoff
        | FROM events),
        |d AS (SELECT *, (abs(steps) + 1)::INT AS g FROM base),
        |e AS (SELECT *, ((g - 1) % 7) AS s0, ((g - 1) // 7) AS oct FROM d),
        |f AS (SELECT *,
        |  (CASE s0 WHEN 0 THEN 0 WHEN 1 THEN 2 WHEN 2 THEN 4 WHEN 3 THEN 5
        |    WHEN 4 THEN 7 WHEN 5 THEN 9 WHEN 6 THEN 11 END) + 12 * oct AS expected
        | FROM e),
        |h AS (SELECT *,
        |  (CASE WHEN steps < 0 THEN -(expected + qoff)
        |    ELSE (expected + qoff) END)::INT AS semitones
        | FROM f),
        |i AS (SELECT *, abs(semitones) - expected AS diff,
        |  (s0 IN (0, 3, 4)) AS perf FROM h),
        |j AS (SELECT *,
        |  CASE WHEN perf THEN
        |    CASE diff WHEN 0 THEN 'P' WHEN 1 THEN 'A' WHEN 2 THEN 'AA'
        |      WHEN -1 THEN 'd' WHEN -2 THEN 'dd' END
        |  ELSE
        |    CASE diff WHEN 0 THEN 'M' WHEN -1 THEN 'm' WHEN 1 THEN 'A'
        |      WHEN 2 THEN 'AA' WHEN -2 THEN 'd' WHEN -3 THEN 'dd' END
        |  END AS qual
        | FROM i)
        |SELECT event_id, steps, semitones,
        | CASE WHEN qual IS NULL THEN NULL
        |   ELSE qual || (CASE WHEN steps < 0 OR (steps = 0 AND semitones < 0)
        |     THEN '-' ELSE '' END) || g::VARCHAR END AS iname,
        | CASE qual WHEN 'AA' THEN 'double_augmented' WHEN 'A' THEN 'augmented'
        |   WHEN 'M' THEN 'major' WHEN 'P' THEN 'perfect' WHEN 'm' THEN 'minor'
        |   WHEN 'dd' THEN 'double_diminished' WHEN 'd' THEN 'diminished'
        |   END AS quality_class,
        | CASE WHEN g = 1 THEN 'repeated' WHEN g = 2 THEN 'stepwise'
        |   ELSE 'leap' END AS size_class,
        | (abs(semitones) <= 12) AS within_octave
        |FROM j""".stripMargin,

    "q72_interval_types" -> {
      def cnt(cond: String, alias: String) =
        s"sum(CASE WHEN $cond THEN 1 ELSE 0 END)::BIGINT AS $alias"
      def triple(pre: String, cond: String) = Seq(
        cnt(s"($cond) AND semitones > 0", s"${pre}_asc"),
        cnt(s"($cond) AND semitones < 0", s"${pre}_desc"),
        cnt(cond, s"${pre}_all"),
        s"round(sum(CASE WHEN $cond THEN 1 ELSE 0 END)::DOUBLE / count(*) + 3.7e-10, 6) AS ${pre}_per")
      def dirStat(pre: String, cond: String) = Seq(
        s"round(coalesce(avg(CASE WHEN $cond THEN semitones END), 0.0) + 3.7e-10, 6) AS ${pre}_mean",
        s"round(coalesce(stddev_samp(CASE WHEN $cond THEN semitones END), 0.0) + 3.7e-10, 6) AS ${pre}_std",
        s"coalesce(sum(CASE WHEN $cond THEN semitones END), 0)::BIGINT AS ${pre}_semi_sum")
      val aggs = (Seq(
        "count(*)::BIGINT AS n_intervals",
        cnt("sc = 'repeated'", "rep_all"),
        "round(sum(CASE WHEN sc = 'repeated' THEN 1 ELSE 0 END)::DOUBLE / count(*) + 3.7e-10, 6) AS rep_per") ++
        triple("stw", "sc = 'stepwise'") ++
        triple("leap", "sc = 'leap'") ++
        triple("within_oct", "wo") ++
        triple("beyond_oct", "NOT wo") ++
        Q72Quals.flatMap { case (q, pre) => triple(pre, s"qc = '$q'") } ++
        dirStat("asc", "semitones > 0") ++
        dirStat("desc", "semitones < 0") ++
        Seq("max(CASE WHEN semitones > 0 THEN semitones END) AS largest_asc_semi",
          "min(CASE WHEN semitones < 0 THEN semitones END) AS largest_desc_semi"))
        .mkString(",\n ")
      s"""WITH base AS (
         | SELECT user_id,
         |  ((event_id % 17) - 8)::INT AS steps,
         |  ((user_id % 7) - 3)::INT AS qoff
         | FROM events),
         |d AS (SELECT *, (abs(steps) + 1)::INT AS g FROM base),
         |e AS (SELECT *, ((g - 1) % 7) AS s0, ((g - 1) // 7) AS oct FROM d),
         |f AS (SELECT *,
         |  (CASE s0 WHEN 0 THEN 0 WHEN 1 THEN 2 WHEN 2 THEN 4 WHEN 3 THEN 5
         |    WHEN 4 THEN 7 WHEN 5 THEN 9 WHEN 6 THEN 11 END) + 12 * oct AS expected
         | FROM e),
         |h AS (SELECT *,
         |  (CASE WHEN steps < 0 THEN -(expected + qoff)
         |    ELSE (expected + qoff) END)::INT AS semitones
         | FROM f),
         |i AS (SELECT *, abs(semitones) - expected AS diff,
         |  (s0 IN (0, 3, 4)) AS perf FROM h),
         |j AS (SELECT *,
         |  CASE WHEN perf THEN
         |    CASE diff WHEN 0 THEN 'P' WHEN 1 THEN 'A' WHEN 2 THEN 'AA'
         |      WHEN -1 THEN 'd' WHEN -2 THEN 'dd' END
         |  ELSE
         |    CASE diff WHEN 0 THEN 'M' WHEN -1 THEN 'm' WHEN 1 THEN 'A'
         |      WHEN 2 THEN 'AA' WHEN -2 THEN 'd' WHEN -3 THEN 'dd' END
         |  END AS qual
         | FROM i),
         |iv AS (
         | SELECT user_id, semitones,
         |  CASE qual WHEN 'AA' THEN 'double_augmented' WHEN 'A' THEN 'augmented'
         |    WHEN 'M' THEN 'major' WHEN 'P' THEN 'perfect' WHEN 'm' THEN 'minor'
         |    WHEN 'dd' THEN 'double_diminished' WHEN 'd' THEN 'diminished'
         |    END AS qc,
         |  CASE WHEN g = 1 THEN 'repeated' WHEN g = 2 THEN 'stepwise'
         |    ELSE 'leap' END AS sc,
         |  (abs(semitones) <= 12) AS wo
         | FROM j WHERE qual IS NOT NULL)
         |SELECT user_id,
         | $aggs
         |FROM iv GROUP BY 1""".stripMargin
    },

    "q76_chord_additions" -> {
      val dom = ChangesDomain.map(c => s"'$c'").mkString(", ")
      def share(c: String) =
        s"round(sum(CASE WHEN cls = '$c' THEN 1 ELSE 0 END)::DOUBLE / count(*) + 3.7e-10, 6) AS ${c}_share"
      s"""WITH base AS (
         | SELECT user_id,
         |  ([$dom])[(event_id % ${ChangesDomain.size})::INT + 1] AS chg
         | FROM events),
         |c AS (
         | SELECT user_id,
         |  CASE WHEN chg = '+9' THEN 'add_9'
         |   WHEN chg IN ('4', '6', '64', '4.0', '6.0', '64.0') THEN 'add_4_6_64'
         |   WHEN contains(chg, '+') THEN 'others_aug'
         |   WHEN chg = 'nan' THEN NULL
         |   ELSE 'others_no_aug' END AS cls
         | FROM base)
         |SELECT user_id, count(*)::BIGINT AS total_chords,
         | ${share("add_9")},
         | ${share("add_4_6_64")},
         | ${share("others_aug")},
         | ${share("others_no_aug")}
         |FROM c GROUP BY 1""".stripMargin
    },

    "q77_numerals_battery" -> {
      val dom = Numerals.map(c => s"'$c'").mkString(", ")
      val aggs = Numerals.flatMap { nm =>
        Seq(s"sum(CASE WHEN numeral = '$nm' THEN 1 ELSE 0 END)::BIGINT AS num_${nm}_count",
          s"round(sum(CASE WHEN numeral = '$nm' THEN 1 ELSE 0 END)::DOUBLE / count(*) + ${Q.TieEps}, 3) AS num_${nm}_per")
      }.mkString(",\n ")
      s"""WITH base AS (
         | SELECT user_id,
         |  ([$dom])[(event_id % ${Numerals.size})::INT + 1] AS numeral
         | FROM events)
         |SELECT user_id, count(*)::BIGINT AS total_numerals,
         | $aggs
         |FROM base GROUP BY 1""".stripMargin
    },

    "q78_interval_moments" ->
      """WITH iv0 AS (
        | SELECT user_id, value, lag(value) OVER
        |   (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        | FROM events),
        |iv AS (
        | SELECT user_id, round(value - prev)::INT AS st
        | FROM iv0 WHERE prev IS NOT NULL)
        |SELECT user_id, count(*)::BIGINT AS n_intervals,
        | CASE WHEN max(abs(st)) > 0
        |   THEN round(skewness(st) + 3.7e-10, 6) END AS skew_st,
        | CASE WHEN max(abs(st)) > 0
        |   THEN round(kurtosis(st) + 3.7e-10, 6) END AS kurt_st,
        | CASE WHEN max(abs(st)) > 0
        |   THEN round(skewness(abs(st)) + 3.7e-10, 6) END AS skew_abs,
        | CASE WHEN max(abs(st)) > 0
        |   THEN round(kurtosis(abs(st)) + 3.7e-10, 6) END AS kurt_abs
        |FROM iv GROUP BY 1""".stripMargin,

    "q79_interval_trim" -> {
      def trimmed(vc: String, sfx: String) =
        s"""t_$sfx AS (
           | SELECT user_id,
           |  round(avg($vc) + 3.7e-10, 6) AS trimmed_mean_$sfx,
           |  round(stddev($vc) + 3.7e-10, 6) AS trimmed_std_$sfx,
           |  count(*)::BIGINT AS trimmed_n_$sfx,
           |  round(any_value(mean_all_$sfx) - avg($vc) + 3.7e-10, 6) AS trim_diff_$sfx,
           |  round(CASE WHEN any_value(mean_all_$sfx) <> 0
           |    THEN (any_value(mean_all_$sfx) - avg($vc)) / any_value(mean_all_$sfx)
           |    ELSE 0 END + 3.7e-10, 6) AS trim_ratio_$sfx
           | FROM ranked
           | WHERE rn_$sfx > floor(cnt * 0.1) AND rn_$sfx <= cnt - floor(cnt * 0.1)
           | GROUP BY user_id)"""
      s"""WITH iv0 AS (
         | SELECT user_id, ts, event_id, value, lag(value) OVER
         |   (PARTITION BY user_id ORDER BY ts, event_id) AS prev
         | FROM events),
         |iv AS (
         | SELECT user_id, ts, event_id,
         |  round(value - prev)::INT AS st, abs(round(value - prev)::INT) AS ast
         | FROM iv0 WHERE prev IS NOT NULL),
         |ranked AS (
         | SELECT user_id, st, ast,
         |  row_number() OVER (PARTITION BY user_id ORDER BY st, ts, event_id) AS rn_st,
         |  row_number() OVER (PARTITION BY user_id ORDER BY ast, ts, event_id) AS rn_abs,
         |  count(*) OVER (PARTITION BY user_id) AS cnt,
         |  avg(st) OVER (PARTITION BY user_id) AS mean_all_st,
         |  avg(ast) OVER (PARTITION BY user_id) AS mean_all_abs
         | FROM iv),
         |${trimmed("st", "st").stripMargin},
         |${trimmed("ast", "abs").stripMargin}
         |SELECT t_st.user_id,
         | t_st.trimmed_mean_st, t_st.trimmed_std_st, t_st.trimmed_n_st,
         | t_st.trim_diff_st, t_st.trim_ratio_st,
         | t_abs.trimmed_mean_abs, t_abs.trimmed_std_abs, t_abs.trimmed_n_abs,
         | t_abs.trim_diff_abs, t_abs.trim_ratio_abs
         |FROM t_st JOIN t_abs USING (user_id)""".stripMargin
    })
}
