package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's key/scale/meter scalar families (SURVEY.md §2.7 F3-F5)
  * re-expressed as pure pitch-class modular arithmetic over int/string
  * columns — codegen'd `when` chains and expressions, no music library.
  *
  * References:
  *  - scale degree of a pitch: `/root/reference/musif/musicxml/common.py:186-196`
  *  - key signature encode ("sss"/"bb"/"n"): `musicxml/key.py:7-25`
  *  - time-signature type classing: `musicxml/tempo.py:20-60`
  *  - beats per time signature: `musicxml/tempo.py:247-280`
  *  - numeral -> harmonic function (T/D/SD 2-level): `extract/features/harmony/utils.py:274-338`
  */
object MusicTheory {

  /** Major-scale interval pattern in semitones from the tonic. */
  private val MajorSteps = Seq(0, 2, 4, 5, 7, 9, 11)
  /** Natural-minor pattern. */
  private val MinorSteps = Seq(0, 2, 3, 5, 7, 8, 10)

  /** Diatonic scale degree (1-7) of `pitchClass` in the key of `tonicPc`
    * with `isMinor` mode; NULL for chromatic (out-of-scale) pitches.
    * Pure mod-12 arithmetic — the analog of
    * `getScaleDegreeAndAccidentalFromPitch` restricted to in-scale pitches. */
  def scaleDegree(pitchClass: Column, tonicPc: Column, isMinor: Column): Column = {
    val rel = pmod(pitchClass - tonicPc, lit(12))
    val major = MajorSteps.zipWithIndex.foldLeft(lit(null).cast("int")) {
      case (acc, (semi, i)) => when(rel === semi && !isMinor, i + 1).otherwise(acc)
    }
    MinorSteps.zipWithIndex.foldLeft(major) {
      case (acc, (semi, i)) => when(rel === semi && isMinor, i + 1).otherwise(acc)
    }
  }

  /** Degree string WITH accidental — the deterministic analog of
    * `get_note_degree`/`to_full_degree`
    * (`/root/reference/musif/extract/features/scale_relative/utils.py:169-189`):
    * diatonic pitches yield "1".."7"; every chromatic pitch class sits one
    * semitone above a diatonic one in both the major and natural-minor
    * patterns, so it is spelled as the sharp of that degree ("#1", "#4", ...)
    * — a fixed spelling convention where music21 picks per-context. NULL
    * tonic/mode propagates to NULL (caller maps to its no-key bucket). */
  def fullDegree(pitchClass: Column, tonicPc: Column, isMinor: Column): Column = {
    val d = scaleDegree(pitchClass, tonicPc, isMinor)
    val sharpOf = scaleDegree(pmod(pitchClass - 1, lit(12)), tonicPc, isMinor)
    when(d.isNotNull, d.cast("string"))
      .when(sharpOf.isNotNull, concat(lit("#"), sharpOf.cast("string")))
  }

  /** Sharps(+)/flats(-) count of a major/minor key from the tonic pitch
    * class, derived from the circle of fifths; range normalized to [-6, 6).
    * Minor keys use the relative major (tonic + 3 semitones). */
  def keySharps(tonicPc: Column, isMinor: Column): Column = {
    val majTonic = when(isMinor, pmod(tonicPc + 3, lit(12))).otherwise(pitchMod(tonicPc))
    // position on the circle of fifths: tonic = 7*sharps (mod 12)
    // => sharps = 7*tonic (mod 12) since 7*7=49=1 (mod 12)
    val s = pmod(majTonic * 7, lit(12))
    when(s >= 6, s - 12).otherwise(s) // 6..11 -> flats -6..-1
  }

  private def pitchMod(c: Column): Column = pmod(c, lit(12))

  /** musif's key-signature string encode: "s"*sharps, "b"*flats, "n". */
  def keySignatureString(tonicPc: Column, isMinor: Column): Column = {
    val s = keySharps(tonicPc, isMinor)
    when(s > 0, repeatStr(lit("s"), s))
      .when(s < 0, repeatStr(lit("b"), -s))
      .otherwise(lit("n"))
  }

  private def repeatStr(s: Column, n: Column): Column =
    call_function("repeat", s, n)

  /** Time-signature type classing (exact table from tempo.py:20-60). */
  def timeSignatureType(ts: Column): Column = {
    val simpleDuple = Seq("1/2", "1/4", "1/8", "1/16", "2/2", "2/4", "2/8",
      "2/16", "4/4", "C", "4/2", "4/8", "4/16", "8/2", "8/4", "8/8", "8/16")
    val compoundDuple = Seq("6/8", "3/8", "12/2", "12/4", "12/8", "12/16")
    val simpleTriple = Seq("3/2", "3/4", "3/16", "6/2", "6/4", "6/16")
    val compoundTriple = Seq("9/2", "9/4", "9/8", "9/16")
    when(ts.isin(simpleDuple: _*), "simple duple")
      .when(ts.isin(compoundDuple: _*), "compound duple")
      .when(ts.isin(simpleTriple: _*), "simple triple")
      .when(ts.isin(compoundTriple: _*), "compound triple")
      .otherwise("other")
  }

  /** Beats per measure for a `num/den` time signature: compound meters
    * (num divisible by 3, > 3) group in threes (tempo.py:247-280). */
  def beatsPerMeasure(num: Column, den: Column): Column =
    when(num > 3 && pmod(num, lit(3)) === 0, num / 3).otherwise(num)

  /** Perfect/major reference semitones for the generic interval implied by
    * `steps` diatonic steps (0 steps = unison): simple-interval table plus
    * 12 per octave. */
  def perfectMajorSemitones(steps: Column): Column = {
    val g = abs(steps) + 1
    val simple0 = pmod(g - 1, lit(7))
    val octaves = floor((g - 1) / 7).cast("int")
    val ref = MajorSteps.zipWithIndex.foldLeft(lit(null).cast("int")) {
      case (acc, (semi, i)) => when(simple0 === i, semi).otherwise(acc)
    }
    ref + octaves * 12
  }

  /** Directed interval name from (signed semitones, signed diatonic steps) —
    * the music21 `Interval.directedName` the reference's melody battery keys
    * on (`/root/reference/musif/musicxml/common.py:199-203`): quality token
    * (dd/d/m/M/P/A/AA from the semitone offset vs the perfect/major
    * reference) + "-" for descending + generic number. NULL when the offset
    * falls outside the dd..AA range. */
  def intervalName(semitones: Column, steps: Column): Column = {
    val g = abs(steps) + 1
    val simple0 = pmod(g - 1, lit(7))
    val isPerfect = simple0.isin(0, 3, 4) // unison/4th/5th class
    val diff = abs(semitones) - perfectMajorSemitones(steps)
    val qual = when(isPerfect,
        when(diff === 0, "P").when(diff === 1, "A").when(diff === 2, "AA")
          .when(diff === -1, "d").when(diff === -2, "dd"))
      .otherwise(
        when(diff === 0, "M").when(diff === -1, "m").when(diff === 1, "A")
          .when(diff === 2, "AA").when(diff === -2, "d").when(diff === -3, "dd"))
    val desc = (steps < 0) || (steps === 0 && semitones < 0)
    when(qual.isNull, lit(null).cast("string"))
      .otherwise(concat(qual, when(desc, "-").otherwise(""), g.cast("string")))
  }

  /** Canonical interval spelling from a bare semitone count — music21's
    * `Interval(int)` convention the reference uses for the mean interval
    * (`melody/handler.py:171`): 0->P1, 1->m2, 2->M2, 3->m3, 4->M3, 5->P4,
    * 6->d5, 7->P5, 8->m6, 9->M6, 10->m7, 11->M7, +7 per octave;
    * descending carries "-" before the number. */
  def intervalNameFromSemitones(semitones: Column): Column = {
    val canon = Seq("P" -> 1, "m" -> 2, "M" -> 2, "m" -> 3, "M" -> 3, "P" -> 4,
      "d" -> 5, "P" -> 5, "m" -> 6, "M" -> 6, "m" -> 7, "M" -> 7)
    val a = abs(semitones)
    val simple = pmod(a, lit(12))
    val oct = floor(a / 12).cast("int")
    val qual = canon.zipWithIndex.foldLeft(lit(null).cast("string")) {
      case (acc, ((q, _), i)) => when(simple === i, q).otherwise(acc)
    }
    val num = canon.zipWithIndex.foldLeft(lit(null).cast("int")) {
      case (acc, ((_, n), i)) => when(simple === i, n).otherwise(acc)
    } + oct * 7
    concat(qual, when(semitones < 0, "-").otherwise(""), num.cast("string"))
  }

  /** Quality classing of a directed interval name — control flow mirrors the
    * reference exactly (`extract/features/melody/handler.py:342-372`):
    * AA before A, case-sensitive M vs m, case-INsensitive perfect, dd
    * before d. */
  def intervalQualityClass(name: Column): Column =
    when(name.isNull, lit(null).cast("string"))
      .when(name.startsWith("AA"), "double_augmented")
      .when(name.startsWith("A"), "augmented")
      .when(name.startsWith("M"), "major")
      .when(lower(name).startsWith("p"), "perfect")
      .when(name.startsWith("m"), "minor")
      .when(name.startsWith("dd"), "double_diminished")
      .when(name.startsWith("d"), "diminished")

  /** Interval size classing (`melody/handler.py:344-349`): generic number
    * 1 = repeated note, 2 = stepwise, >= 3 = leap. */
  def intervalSizeClass(steps: Column): Column = {
    val g = abs(steps) + 1
    when(g === 1, "repeated").when(g === 2, "stepwise").otherwise("leap")
  }

  /** |semitones| <= 12 — within vs beyond the octave (`handler.py:351-354`). */
  def withinOctave(semitones: Column): Column = abs(semitones) <= 12

  /** `parse_chord` (`harmony/utils.py:503-517`): strip decorations — the
    * suffix from the first of `( o + % M` — then trailing figures, leaving
    * the bare numeral. Chained prefix-takes equal the reference's
    * sequential splits (each only shortens the string). */
  def parseChord(c: Column): Column = {
    val undecorated = Seq("(", "o", "+", "%", "M").foldLeft(c) {
      (acc, ch) => substring_index(acc, ch, 1)
    }
    regexp_extract(undecorated, "^([^0-9]*)", 1)
  }

  /** `get_chord_type` classing (`harmony/utils.py:519-538`). */
  def chordTypeClass(t: Column): Column =
    when(t === "m", "minor triad")
      .when(t === "M", "mayor triad") // sic — the reference's spelling
      .when(t.isin("7", "mm7", "Mm7", "MM7", "mM7"), "7th")
      .when(t.isin("o", "o7", "%", "%7"), "dim")
      .when(t.isin("+", "+M7", "+m7"), "aug")
      .otherwise("other")

  /** The reference's `local_key.isupper()` mode test
    * (`harmony/utils.py:541-546`): "M" only when the WHOLE key string is
    * uppercase (so "Bb" reads as minor — faithful, not corrected). */
  def localKeyMode(k: Column): Column =
    when(upper(k) === k, "M").otherwise("m")

  /** Second-level harmonic-function grouping — `get_function_second`
    * (`/root/reference/musif/extract/features/harmony/utils.py:329-338`):
    * b->-, "#ln"->"#ST", rm/rj->"rel", st/ln->"ST", else UPPER with -
    * restored to b (so "bST"/"bst" collapse to "bST", "sd" to "SD"). */
  def harmonicFunctionSecond(f1: Column): Column = {
    val el = regexp_replace(f1, "b", "-")
    when(lower(el) === "#ln", "#ST")
      .when(el.isin("rm", "rj"), "rel")
      .when(upper(el).isin("ST", "LN"), "ST")
      .otherwise(regexp_replace(upper(el), "-", "b"))
  }

  /** First-level harmonic function of a roman numeral in a mode ("M"/"m") —
    * `get_function_first` (harmony/utils.py:274-338) over the plain-numeral
    * domain (augmented-sixth It/Ger/Fr specials excluded). Control flow
    * mirrors the reference exactly: vii/#vii return "D" early for ANY case,
    * bII is the Neapolitan, bVII variants are mode-specific subtonics, and
    * the core table (i->T, v->D, ii/iv/vi->SD, iii->MED) carries the
    * numeral's case (upper = major quality, lower = minor). */
  def harmonicFunction(numeral: Column, mode: Column): Column = {
    val base = lower(numeral)
    val isLower = numeral === base
    val core = when(base === "i", "T")
      .when(base === "v", "D")
      .when(base.isin("ii", "iv", "vi"), "SD")
      .when(base === "iii", "MED")
    val cased = when(isLower, lower(core)).otherwise(core)
    when(base.isin("vii", "#vii"), "D") // reference's early return
      .when(base === "bii", "NAP")
      .when(mode === "M" && numeral === "bVII", "ST")
      .when(mode === "M" && numeral === "bvii", "st")
      .when(mode === "m" && numeral === "bVII", "bST")
      .when(mode === "m" && numeral === "bvii", "bst")
      .otherwise(cased)
  }
}
