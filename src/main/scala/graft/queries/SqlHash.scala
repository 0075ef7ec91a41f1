package graft.queries

import graft.functions.{ImageCodec, Text}

/** DuckDB SQL fragment generators that replay graft's engine-internal
  * 64-bit hashing — [[Text.polyHash]] (FNV-1a over chars) and the
  * mix64-derived MinHash permutations — in exact wrap-around arithmetic.
  *
  * DuckDB's UBIGINT ERRORS on overflow rather than wrapping, so every
  * add/multiply here is composed from 32-bit halves whose intermediates
  * provably stay below 2^64:
  *  - uadd: lo/hi 32-bit column sums with an explicit carry (max 2^33);
  *  - umul: a_lo*b_lo (< 2^64) plus the masked cross terms shifted by 32
  *    via multiplication (cross & 0xFFFFFFFF, then * 2^32 < 2^64).
  * Signed Long <-> UBIGINT conversions go through an offset by 2^63 so
  * neither cast can overflow. The lane/band constants are read from the
  * SAME source as the engine (ImageCodec.mix64), so the oracle and the
  * codegen'd expressions cannot drift apart; SqlHashSpec pins the affine
  * constants against Text.minHashSignature's observable output.
  *
  * Why these oracles exist: q50-q52's production paths hash with polyHash
  * inside codegen'd Catalyst expressions, which until round 4 made them
  * rows-only in the driver's DuckDB correctness gate (covered indirectly
  * by the md5-sibling queries q86/q59/q75). Replaying the exact FNV-1a in
  * DuckDB retires that gap: the production signatures themselves are now
  * hash-compared cross-engine.
  */
object SqlHash {
  private val M32 = "4294967295::UBIGINT"
  private val Two32 = "4294967296::UBIGINT"
  private val Two63U = "9223372036854775808::UBIGINT"
  /** -2^63 spelled without a bare out-of-range literal. */
  private val MinLong = "(-9223372036854775807 - 1)"
  val LongMaxSql = "9223372036854775807"

  /** 64-bit value as an UBIGINT literal (two's-complement reinterpret). */
  def ulit(v: Long): String = java.lang.Long.toUnsignedString(v) + "::UBIGINT"

  /** (x + y) mod 2^64 over UBIGINT expressions. */
  def uadd(x: String, y: String): String =
    s"(((((($x) >> 32) + (($y) >> 32) + ((((($x) & $M32) + (($y) & $M32))) >> 32)) & $M32) * $Two32)" +
      s" + (((($x) & $M32) + (($y) & $M32)) & $M32))"

  /** (a * b) mod 2^64 over UBIGINT expressions. */
  def umul(a: String, b: String): String = {
    val low = s"((($a) & $M32) * (($b) & $M32))"
    val cross = s"((((($a) & $M32) * (($b) >> 32)) & $M32) + (((($a) >> 32) * (($b) & $M32)) & $M32))"
    uadd(low, s"((($cross) & $M32) * $Two32)")
  }

  /** UBIGINT expr reinterpreted as signed BIGINT (Java Long semantics). */
  def signed(u: String): String =
    s"(CASE WHEN ($u) >= $Two63U THEN (($u) - $Two63U)::BIGINT + $MinLong ELSE ($u)::BIGINT END)"

  /** Signed BIGINT expr reinterpreted as UBIGINT. */
  def unsigned(s: String): String =
    s"(CASE WHEN ($s) < 0 THEN (($s) - $MinLong)::UBIGINT + $Two63U ELSE ($s)::UBIGINT END)"

  /** One FNV-1a step: (h ^ c) * prime mod 2^64. */
  def fnvStep(h: String, c: String): String =
    umul(s"xor(($h), ($c))", ulit(Text.PolyHashPrime))

  /** [[Text.polyHash]] of an ASCII varchar expr -> UBIGINT. The fold runs
    * as a list_reduce lambda (one step's expression, applied per char) —
    * NOT chained lateral aliases, which DuckDB expands by textual
    * substitution into a 9^n-size tree. */
  def polyHash(s: String): String = {
    val codes = s"list_transform(range(1, length($s) + 1), i -> ord(substr($s, i, 1))::UBIGINT)"
    s"list_reduce(list_prepend(${ulit(Text.PolyHashBasis)}, $codes), (h, c) -> ${fnvStep("h", "c")})"
  }

  /** polyHash of every positional n-char shingle of `nt` (possibly-empty
    * LIST(UBIGINT)) — the hash stream [[Text.minHashSignature]] consumes. */
  def shingleHashes(nt: String, n: Int = 5): String = {
    val codes = s"list_transform(range(0, $n), k -> ord(substr($nt, i + k, 1))::UBIGINT)"
    val fold = s"list_reduce(list_prepend(${ulit(Text.PolyHashBasis)}, $codes), (h, c) -> ${fnvStep("h", "c")})"
    s"(CASE WHEN length($nt) >= $n THEN list_transform(range(1, length($nt) - ($n - 2)), i -> $fold) ELSE [] END)"
  }

  /** The engine's MinHash permutation constants (Text.MinHashA/B). */
  def minHashAffine(j: Int): (Long, Long) =
    (ImageCodec.mix64(2L * j + 1) | 1L, ImageCodec.mix64(1000L + j))

  /** SELECT-list fragment: lanes mh<j> = min over shingle-hash list `xs`
    * of signed(a_j * x + b_j), Long.MaxValue when the list is empty —
    * exactly [[Text.minHashSignature]]. */
  def laneSelects(lanes: Range): String =
    lanes.map { j =>
      val (a, b) = minHashAffine(j)
      val v = signed(uadd(umul("x", ulit(a)), ulit(b)))
      s"COALESCE(list_min(list_transform(xs, x -> $v)), $LongMaxSql) AS mh$j"
    }.mkString(",\n ")

  /** Wrap `inner` (which exposes mh<0..bands*rows-1>) in nested SELECTs
    * computing the [[Text.lshBuckets]] band folds f<b> (UBIGINT):
    * h = (1125899906842597 ^ b); h = h * 31 + sig[b*rows + r]. Chained
    * subqueries keep each step reading a REAL column (constant expression
    * size), instead of lateral aliases (exponential substitution). */
  def bandFolds(inner: String, bands: Seq[Int], rows: Int): String = {
    var q = s"SELECT *, ${bands.map(b => s"${ulit(1125899906842597L ^ b)} AS f$b").mkString(", ")} FROM ($inner)"
    for (r <- 0 until rows)
      q = "SELECT * REPLACE (" +
        bands.map(b => s"${uadd(umul(s"f$b", ulit(31L)), unsigned(s"mh${b * rows + r}"))} AS f$b").mkString(", ") +
        s") FROM ($q)"
    q
  }

  /** Per-doc 64-bit SimHash of whitespace tokens of `nt` — exactly
    * [[Text.simHash64]]: per-bit ±1 votes over polyHash(token), bit set
    * iff vote > 0 (strict majority). `from` must expose (idCol, nt).
    * Docs with empty nt get simhash 0 (no tokens -> all votes 0). */
  def simHashSelect(from: String, idCol: String): String = {
    val th = s"""SELECT $idCol, ${polyHash("tok")} AS h
FROM (SELECT $idCol, unnest(string_split(nt, ' ')) AS tok FROM ($from) WHERE length(nt) > 0)"""
    val votes = (0 until 64)
      .map(i => s"SUM(CASE WHEN (h >> $i) & 1::UBIGINT = 1::UBIGINT THEN 1 ELSE -1 END) AS b$i")
      .mkString(", ")
    val compose = (0 until 64)
      .map(i => s"(CASE WHEN b$i > 0 THEN ${ulit(1L << i)} ELSE 0::UBIGINT END)")
      .mkString(" + ") // distinct bit weights: the sum is < 2^64, no overflow
    s"""SELECT $idCol, ${signed(s"($compose)")} AS sh
FROM (SELECT $idCol, $votes FROM ($th) GROUP BY $idCol)"""
  }
}
