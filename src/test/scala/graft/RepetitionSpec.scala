package graft

import scala.util.Random

/** Randomized parity for the q92 repetition signals: the exploded
  * two-level hash-aggregate formulation must equal a straight-line Scala
  * reference on arbitrary token streams (incl. empty docs, single-token
  * docs, and heavy repeats). */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x + 3.7e-10).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("repetition signals match a straight-line reference on random docs") {
    val rnd = new Random(7)
    val vocab = Vector("a", "b", "c", "ab", "xyz", "q")
    val docs = (0L until 80L).map { i =>
      val n = rnd.nextInt(12) // 0..11 tokens: empty + short + repeat-heavy
      (i, Vector.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val got = queries.TextQueries.repetitionSignals(docs.toDF("doc_id", "nt"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap

    docs.foreach { case (id, nt) =>
      if (nt.isEmpty) assert(!got.contains(id), s"empty doc $id emitted")
      else {
        val ts = nt.split(" ").toSeq
        val g2 = ts.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
        val g3 = ts.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSeq
        val top2 = if (g2.isEmpty) 0.0
          else g2.groupBy(identity).values.map(_.size).max.toDouble / g2.size
        val dup3 = if (g3.isEmpty) 0.0
          else g3.groupBy(identity).values.map(_.size)
            .filter(_ > 1).sum.toDouble / g3.size
        val (n, dr, t2, d3) = got(id)
        assert(n === ts.size.toLong, s"doc $id n_tokens")
        assert(math.abs(dr - r6(ts.distinct.size.toDouble / ts.size)) < 1e-9,
          s"doc $id distinct_ratio")
        assert(math.abs(t2 - r6(top2)) < 1e-9, s"doc $id top2gram")
        assert(math.abs(d3 - r6(dup3)) < 1e-9, s"doc $id dup3gram")
      }
    }
  }
}
