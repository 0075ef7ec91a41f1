package graft.ops

import graft.SparkSpec

/** Each quality rule firing on a crafted document, plus the keep case and
  * the empty-doc/NULL-signal interaction. */
class QualityFilterSpec extends SparkSpec {
  import spark.implicits._

  test("every rule fires on its crafted doc; clean docs keep") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near a barn"),
      (2L, ""),                                            // empty
      (3L, "the cat sat"),                                 // too few tokens
      (4L, ("the " * 60).trim),                            // low distinct + rep
      (5L, "the abcdefghijklmnopqrstuvwxyz abcdefghijklmnop qrstuvwxyzabcdef ghijklmnopqrstuv"), // long words
      (6L, "zebra quagga okapi tapir bongo duiker")        // no stopwords
    ).toDF("doc_id", "nt")
    val got = QualityFilter.classify(docs)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("keep"), r.getAs[String]("reasons"))).toMap

    assert(got(1L) === ((true, "")))
    assert(got(2L) === ((false, "empty")))
    assert(got(3L)._2 === "too_few_tokens")
    // 60x "the": 1/60 distinct ratio, "the the" dominates 2-grams, every
    // 3-gram repeats — three rules at once, in declaration order
    assert(got(4L)._2 ===
      "low_distinct_ratio;high_top2gram;high_dup3gram")
    assert(got(5L)._2.contains("word_length"), got(5L)._2)
    assert(got(6L) === ((false, "low_stopword")))
    // a doc too long: > maxTokens
    val long = Seq((7L, Seq.tabulate(1001)(i => s"the w$i").mkString(" ")))
      .toDF("doc_id", "nt")
    val r7 = QualityFilter.classify(long).collect()(0)
    assert(r7.getAs[String]("reasons") === "too_many_tokens")
  }

  test("custom thresholds move the boundaries") {
    val docs = Seq((1L, "the alpha beta gamma")).toDF("doc_id", "nt")
    assert(QualityFilter.classify(docs)
      .collect()(0).getAs[String]("reasons") === "too_few_tokens")
    val relaxed = QualityFilter.Thresholds(minTokens = 3)
    assert(QualityFilter.classify(docs, relaxed)
      .collect()(0).getAs[Boolean]("keep"))
  }
}
