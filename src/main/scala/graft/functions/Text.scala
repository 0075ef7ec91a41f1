package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis + dedup primitives for the training-data pipeline layer:
  * normalization, fingerprinting, token counting, language-ID heuristic,
  * quality scoring, MinHash/SimHash signatures.
  *
  * Everything SQL-expressible is built from codegen'd built-ins with an
  * exactly-matching DuckDB formulation (driver oracle); only the signature
  * functions (MinHash/SimHash) use deterministic Scala UDFs — they are
  * per-row (no shuffle) and verified by ScalaTest instead.
  */
object Text {

  /** lower + trim + whitespace collapse; the canonical form every other
    * function operates on. DuckDB: regexp_replace(lower(trim(t)), '\s+', ' ', 'g') */
  def normText(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Stable document fingerprint = md5 of the normalized text (md5 hex is
    * identical in Spark and DuckDB). */
  def fingerprint(c: Column): Column = md5(normText(c))

  /** Whitespace token count over normalized text. */
  def tokenCount(c: Column): Column = {
    val n = normText(c)
    when(length(n) === 0, 0).otherwise(size(split(n, " ")))
  }

  /** Occurrences of `word` as a whole token inside normalized text. Exact
    * split-and-count (codegen'd HOF): the replace-length trick undercounts
    * ADJACENT repeats ("the the the" -> 1, the shared space is consumed by
    * the non-overlapping replace). DuckDB mirror:
    * len(list_filter(string_split(nt, ' '), x -> x = 'w')). */
  def tokenOccurrences(norm: Column, word: String): Column =
    size(filter(split(norm, " "), x => x === lit(word))).cast("int")

  /** Marker-word language scores; deterministic argmax with fixed precedence
    * en > de > fr > unknown. */
  val EnMarkers = Seq("the", "and", "a", "of")
  val DeMarkers = Seq("der", "und", "die", "das")
  val FrMarkers = Seq("le", "la", "et", "les")

  def langScore(norm: Column, markers: Seq[String]): Column =
    markers.map(tokenOccurrences(norm, _)).reduce(_ + _)

  def langId(c: Column): Column = {
    val n = normText(c)
    val en = langScore(n, EnMarkers)
    val de = langScore(n, DeMarkers)
    val fr = langScore(n, FrMarkers)
    when(en === 0 && de === 0 && fr === 0, "und")
      .when(en >= de && en >= fr, "en")
      .when(de >= fr, "de")
      .otherwise("fr")
  }

  /** Heuristic quality score in [0,1]: length saturation + lexical
    * diversity + mean token length saturation. */
  def qualityScore(c: Column): Column = {
    val n = normText(c)
    val toks = tokenCount(c).cast("double")
    val distinctToks = size(array_distinct(split(n, " "))).cast("double")
    val avgTokLen = (length(n) - (toks - 1)) / toks
    val lenScore = least(lit(1.0), toks / 100.0)
    val divScore = Stats.safeDivD(distinctToks, toks)
    val tokLenScore = least(lit(1.0), avgTokLen / 8.0)
    when(toks === 0, 0.0)
      .otherwise(lit(0.4) * lenScore + lit(0.3) * divScore + lit(0.3) * tokLenScore)
  }

  /** Stopword ratio (en markers / tokens). */
  def stopwordRatio(c: Column): Column = {
    val toks = tokenCount(c).cast("double")
    Stats.safeDivD(langScore(normText(c), EnMarkers).cast("double"), toks)
  }

  private object Stats {
    def safeDivD(num: Column, den: Column): Column =
      when(den =!= 0 && den.isNotNull, num / den).otherwise(lit(0.0))
  }

  /** BPE-ish regex tokenization (GPT-2-style word/number/punctuation
    * splitting, simplified to a dialect-safe alternation that Java regex and
    * RE2 agree on): runs of letters, runs of digits, and runs of other
    * non-space characters each form a token, with an optional leading
    * space consumed. Operates on normalized text (lower + collapsed
    * whitespace). DuckDB: len(regexp_extract_all(nt, pattern)). */
  final val BpeTokenPattern = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"

  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(normText(c), lit(BpeTokenPattern), lit(0))).cast("int")

  /** Winnowing document fingerprints (the MOSS rolling-hash scheme): hash
    * every `shingleLen`-char shingle, then keep the MINIMUM hash of every
    * window of `w` consecutive shingle hashes — the classic guarantee that
    * any match of length >= w + shingleLen - 1 shares a fingerprint.
    * Hashes are md5 hex strings and minima are lexicographic so BOTH
    * engines compute identical fingerprints with ordinary SQL (the
    * engine-native 64-bit hashes need queries.SqlHash's wrap-arithmetic
    * replay, which md5 avoids). Fully HOF-composed — no UDF; DuckDB
    * mirror via list_transform/list_slice/list_aggregate('min'). */
  def winnowFingerprints(norm: Column, shingleLen: Int = 5, w: Int = 4): Column =
    winnowFromHashes(shingleHashes(norm, shingleLen), w)

  /** Hash sequence of the RAW (positional) shingles — winnowing stage 1.
    *
    * PERF CONTRACT for hot paths: bind this to its own column in a separate
    * select, then apply [[winnowFromHashes]] on the bound column. The fused
    * [[winnowFingerprints]] expression references the hash array from
    * INSIDE the window lambda (`slice(hashes, ...)`), and HOF lambdas are
    * interpreted, not codegen'd — every captured subtree re-evaluates per
    * element. If Project-collapse inlines the whole tree (it does whenever
    * the fingerprint column is referenced exactly once, e.g. under an
    * `explode`), the shingle+md5+normalization work reruns once per window
    * position: O(len²) per row. Binding the stages as columns keeps each
    * referenced >1 time, which blocks CollapseProject and pins each stage
    * to one evaluation per row. */
  def shingleHashes(norm: Column, shingleLen: Int = 5): Column =
    transform(charShinglesRaw(norm, shingleLen), x => md5(x.cast("binary")))

  /** Winnowing stage 2: minimum hash of every window of `w` consecutive
    * shingle hashes, dedup'd. See [[shingleHashes]] for the staging
    * contract. */
  def winnowFromHashes(hashes: Column, w: Int = 4): Column =
    when(size(hashes) >= w,
      array_distinct(transform(sequence(lit(0), size(hashes) - w),
        i => array_min(slice(hashes, i + lit(1), lit(w))))))
      .otherwise(when(size(hashes) > 0, array(array_min(hashes)))
        .otherwise(array().cast("array<string>")))

  /** Distinct character n-gram (shingle) set of an already-normalized text
    * column — the exact-Jaccard ground truth the MinHash estimate
    * approximates. DuckDB mirror:
    * list_distinct(list_transform(range(1, length(nt)-(n-2)), i -> nt[i:i+(n-1)])). */
  def charShingles(norm: Column, n: Int = 5): Column =
    array_distinct(charShinglesRaw(norm, n))

  /** Positional (non-distinct) shingle sequence — winnowing runs windows
    * over this. */
  def charShinglesRaw(norm: Column, n: Int = 5): Column =
    when(length(norm) >= n,
      transform(sequence(lit(0), length(norm) - n),
        i => norm.substr(i + lit(1), lit(n))))
      .otherwise(array().cast("array<string>"))

  // ---------------------------------------------------------------- MinHash

  /** FNV-1a offset basis / prime — shared with the DuckDB replay
    * (queries.SqlHash), which re-derives the same hashes in wrap-safe
    * UBIGINT arithmetic so q50-q52 carry direct oracles. */
  final val PolyHashBasis = 1469598103934665603L
  final val PolyHashPrime = 1099511628211L

  /** Deterministic polynomial hash of a string (FNV-1a over UTF-16 chars;
    * ASCII inputs make it cross-engine replayable — see SqlHash). */
  def polyHash(s: String): Long = {
    var h = PolyHashBasis
    var i = 0
    while (i < s.length) { h = (h ^ s.charAt(i)) * PolyHashPrime; i += 1 }
    h
  }

  final val MinHashK = 16
  final val MinHashBands = 4 // 4 rows per band
  /** Longest supported signature: precision-sensitive callers (e.g. the
    * exactness-gated q59) use k=32 with 16x2 banding for ~1e-4 miss odds at
    * j=0.6, while the default pipeline stays at k=16. */
  final val MinHashMaxK = 32

  // permutation constants depend only on j — hoisted out of the per-shingle
  // loop (they were ~2/3 of the inner-loop work in the q50/q51 hot path)
  private val MinHashA: Array[Long] =
    Array.tabulate(MinHashMaxK)(j => ImageCodec.mix64(2 * j + 1) | 1L)
  private val MinHashB: Array[Long] =
    Array.tabulate(MinHashMaxK)(j => ImageCodec.mix64(1000 + j))

  /** MinHash signature of the `shingleLen`-char shingle set of normalized
    * text; k universal-hash permutations h_i(x) = a_i*x + b_i (odd a). */
  def minHashSignature(norm: String, shingleLen: Int = 5, k: Int = MinHashK): Array[Long] = {
    require(k <= MinHashMaxK, s"k up to $MinHashMaxK supported: $k")
    val sig = Array.fill(k)(Long.MaxValue)
    if (norm.length >= shingleLen) {
      var i = 0
      while (i <= norm.length - shingleLen) {
        val x = polyHash(norm.substring(i, i + shingleLen))
        var j = 0
        while (j < k) {
          val v = MinHashA(j) * x + MinHashB(j)
          if (v < sig(j)) sig(j) = v
          j += 1
        }
        i += 1
      }
    }
    sig
  }

  /** LSH band buckets from a signature: one bucket id per band (hash of the
    * band's rows). Docs sharing ANY bucket are near-dup candidates. */
  def lshBuckets(sig: Array[Long], bands: Int = MinHashBands): Array[Long] = {
    val rows = sig.length / bands
    Array.tabulate(bands) { b =>
      var h = 1125899906842597L ^ b
      var r = 0
      while (r < rows) { h = h * 31 + sig(b * rows + r); r += 1 }
      h
    }
  }

  /** 64-bit SimHash over whitespace tokens of normalized text. */
  def simHash64(norm: String): Long = {
    val votes = new Array[Int](64)
    if (norm.nonEmpty) {
      norm.split(" ").foreach { t =>
        val h = polyHash(t)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  // Column-level signature API lives in TextFunctions (TextExpressions.scala)
  // as codegen'd Catalyst expressions — no Scala UDF in the q50-q52/q59 hot
  // paths. Band-count note: more bands (fewer rows each) = higher candidate
  // recall at a given Jaccard — 16x2 catches j>=0.6 pairs with
  // P ~ 1-(1-j^2)^16, vs ~0.43 for the default 4x4.
}
