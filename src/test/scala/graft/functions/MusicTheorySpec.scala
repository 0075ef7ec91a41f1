package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MusicTheorySpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, rows: (Int, Int, Boolean)*) =
    rows.toSeq.toDF("pc", "tonic", "minor").select(c).collect().map(r => Option(r.get(0))).toSeq

  test("scaleDegree: C major degrees and chromatic nulls") {
    // key C (tonic 0) major: C D E F G A B = degrees 1..7; C# chromatic
    val got = one(MusicTheory.scaleDegree(col("pc"), col("tonic"), col("minor")),
      (0, 0, false), (2, 0, false), (4, 0, false), (5, 0, false),
      (7, 0, false), (9, 0, false), (11, 0, false), (1, 0, false))
    assert(got === Seq(Some(1), Some(2), Some(3), Some(4), Some(5), Some(6), Some(7), None))
  }

  test("scaleDegree: A minor flat-3/6/7 pattern") {
    // A minor (tonic 9): A B C D E F G = 1..7; G# (8) chromatic
    val got = one(MusicTheory.scaleDegree(col("pc"), col("tonic"), col("minor")),
      (9, 9, true), (0, 9, true), (4, 9, true), (8, 9, true))
    assert(got === Seq(Some(1), Some(3), Some(5), None))
  }

  test("keySharps: circle of fifths, minor via relative major") {
    // C=0 major -> 0; G=7 -> 1 sharp; F=5 -> 1 flat; A minor -> 0; E=4 -> 4 sharps
    val got = one(MusicTheory.keySharps(col("tonic"), col("minor")).cast("int"),
      (0, 0, false), (0, 7, false), (0, 5, false), (0, 9, true), (0, 4, false))
    assert(got === Seq(Some(0), Some(1), Some(-1), Some(0), Some(4)))
  }

  test("keySignatureString: s/b/n encode (key.py:7-25)") {
    val got = Seq((7, false), (5, false), (0, false), (4, false))
      .toDF("tonic", "minor")
      .select(MusicTheory.keySignatureString(col("tonic"), col("minor")))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("s", "b", "n", "ssss"))
  }

  test("timeSignatureType: exact reference table") {
    val got = Seq("4/4", "C", "6/8", "3/4", "9/8", "7/8").toDF("ts")
      .select(MusicTheory.timeSignatureType(col("ts"))).collect().map(_.getString(0)).toSeq
    assert(got === Seq("simple duple", "simple duple", "compound duple",
      "simple triple", "compound triple", "other"))
  }

  test("beatsPerMeasure: compound meters group in threes") {
    val got = Seq((4, 4), (6, 8), (3, 4), (12, 8), (2, 2)).toDF("num", "den")
      .select(MusicTheory.beatsPerMeasure(col("num"), col("den")).cast("int"))
      .collect().map(_.getInt(0)).toSeq
    assert(got === Seq(4, 2, 3, 4, 2))
  }

  test("harmonicFunction mirrors get_function_first control flow") {
    def f(n: String, m: String) = Seq((n, m)).toDF("numeral", "mode")
      .select(MusicTheory.harmonicFunction(col("numeral"), col("mode")))
      .collect()(0).getString(0)
    assert(f("I", "M") === "T" && f("i", "m") === "t")
    assert(f("V", "M") === "D" && f("v", "m") === "d")
    assert(f("vii", "m") === "D" && f("VII", "M") === "D" && f("#vii", "m") === "D")
    assert(f("bII", "M") === "NAP" && f("bii", "m") === "NAP")
    assert(f("IV", "M") === "SD" && f("vi", "m") === "sd")
    assert(f("iii", "M") === "med" && f("III", "M") === "MED")
    assert(f("bVII", "M") === "ST" && f("bVII", "m") === "bST")
  }

  test("intervalName: music21 directedName on hand-checked pairs") {
    def n(semis: Int, steps: Int): String = Seq((semis, steps)).toDF("s", "st")
      .select(MusicTheory.intervalName(col("s"), col("st"))).collect()(0).getString(0)
    assert(n(0, 0) === "P1")
    assert(n(1, 0) === "A1" && n(-1, 0) === "A-1")
    assert(n(4, 2) === "M3" && n(3, 2) === "m3")
    assert(n(-4, -2) === "M-3")
    assert(n(7, 4) === "P5" && n(-7, -4) === "P-5")
    assert(n(6, 3) === "A4" && n(6, 4) === "d5")
    assert(n(12, 7) === "P8" && n(13, 7) === "A8")
    assert(n(10, 6) === "m7" && n(9, 6) === "d7" && n(8, 6) === "dd7")
    assert(n(16, 9) === "M10") // compound: 3rd + octave
    assert(n(20, 9) == null)   // offset out of dd..AA range
  }

  test("parseChord / chordTypeClass / localKeyMode mirror harmony/utils.py") {
    def pc(s: String) = Seq(Tuple1(s)).toDF("c")
      .select(MusicTheory.parseChord(col("c"))).collect()(0).getString(0)
    assert(pc("V7(9)") === "V" && pc("viio7") === "vii" && pc("IV+6") === "IV")
    assert(pc("ii%43") === "ii" && pc("IM7") === "I" && pc("V43") === "V")
    assert(pc("bVII64") === "bVII" && pc("i") === "i")
    def ct(s: String) = Seq(Tuple1(s)).toDF("t")
      .select(MusicTheory.chordTypeClass(col("t"))).collect()(0).getString(0)
    assert(ct("m") === "minor triad" && ct("M") === "mayor triad")
    assert(ct("Mm7") === "7th" && ct("%7") === "dim" && ct("+m7") === "aug")
    assert(ct("weird") === "other")
    def mode(s: String) = Seq(Tuple1(s)).toDF("k")
      .select(MusicTheory.localKeyMode(col("k"))).collect()(0).getString(0)
    assert(mode("C") === "M" && mode("c") === "m")
    assert(mode("Bb") === "m") // faithful isupper() quirk
  }

  test("intervalNameFromSemitones: music21 canonical spelling") {
    def n(st: Int): String = Seq(Tuple1(st)).toDF("st")
      .select(MusicTheory.intervalNameFromSemitones(col("st"))).collect()(0).getString(0)
    assert(n(0) === "P1" && n(1) === "m2" && n(2) === "M2" && n(3) === "m3")
    assert(n(4) === "M3" && n(5) === "P4" && n(6) === "d5" && n(7) === "P5")
    assert(n(8) === "m6" && n(9) === "M6" && n(10) === "m7" && n(11) === "M7")
    assert(n(12) === "P8" && n(13) === "m9" && n(14) === "M9")
    assert(n(-7) === "P-5" && n(-12) === "P-8")
  }

  test("interval quality/size classes mirror handler.py branch order") {
    def q(name: String): String = Seq(Tuple1(name)).toDF("n")
      .select(MusicTheory.intervalQualityClass(col("n"))).collect()(0).getString(0)
    assert(q("AA4") === "double_augmented" && q("A4") === "augmented")
    assert(q("M3") === "major" && q("m3") === "minor")
    assert(q("P5") === "perfect" && q("P-5") === "perfect")
    assert(q("dd7") === "double_diminished" && q("d5") === "diminished")
    def sz(steps: Int): String = Seq(Tuple1(steps)).toDF("st")
      .select(MusicTheory.intervalSizeClass(col("st"))).collect()(0).getString(0)
    assert(sz(0) === "repeated" && sz(1) === "stepwise" && sz(-1) === "stepwise")
    assert(sz(2) === "leap" && sz(-7) === "leap")
  }
}
