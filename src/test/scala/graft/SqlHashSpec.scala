package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Text
import graft.queries.SqlHash

/** Pins the q50-q52 DuckDB-replay generator to the engine's actual hash
  * semantics: same permutation constants, same wrap-around fold, same
  * two's-complement literal rendering. The SQL itself is exercised by the
  * driver's DuckDB gate (and tools/check_oracle.py); these tests make a
  * constant drift between Text and SqlHash fail fast in `sbt test`. */
class SqlHashSpec extends AnyFunSuite {

  test("minHashAffine reproduces Text.minHashSignature lane-for-lane") {
    for (norm <- Seq("the quick brown fox jumps over the lazy dog",
                     "aaaaa", "abcd", "", "key agg row scan slow fast")) {
      val ref = Text.minHashSignature(norm, k = 16)
      val xs = (0 to norm.length - 5).map(i => Text.polyHash(norm.substring(i, i + 5)))
      val got = Array.tabulate(16) { j =>
        val (a, b) = SqlHash.minHashAffine(j)
        if (xs.isEmpty) Long.MaxValue else xs.map(x => a * x + b).min
      }
      assert(got.toSeq == ref.toSeq, s"norm=$norm")
    }
  }

  test("the band-fold recurrence matches Text.lshBuckets") {
    val sig = Text.minHashSignature("some text for bucket folding checks", k = 16)
    val ref = Text.lshBuckets(sig)
    val got = Array.tabulate(4) { bnd =>
      var h = 1125899906842597L ^ bnd // the constant bandFolds inlines
      (0 until 4).foreach(r => h = h * 31 + sig(bnd * 4 + r))
      h
    }
    assert(got.toSeq == ref.toSeq)
  }

  test("ulit renders two's-complement unsigned literals") {
    assert(SqlHash.ulit(-1L) == "18446744073709551615::UBIGINT")
    assert(SqlHash.ulit(Long.MinValue) == "9223372036854775808::UBIGINT")
    assert(SqlHash.ulit(7L) == "7::UBIGINT")
  }

  test("generated lane SQL embeds the engine's permutation constants") {
    val sql = SqlHash.laneSelects(0 until 2)
    for (j <- 0 until 2; v <- { val (a, b) = SqlHash.minHashAffine(j); Seq(a, b) })
      assert(sql.contains(java.lang.Long.toUnsignedString(v)))
    // and the FNV prime/basis both appear in the shingle fold
    val fold = SqlHash.shingleHashes("nt")
    assert(fold.contains(java.lang.Long.toUnsignedString(Text.PolyHashPrime)))
    assert(fold.contains(java.lang.Long.toUnsignedString(Text.PolyHashBasis)))
  }
}
