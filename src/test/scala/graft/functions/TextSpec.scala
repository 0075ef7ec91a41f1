package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, s: String) =
    Seq(s).toDF("t").select(c).collect()(0)

  test("normText: lower, trim, whitespace collapse") {
    assert(one(Text.normText(col("t")), "  Hello \t WORLD  x ").getString(0) === "hello world x")
  }

  test("tokenCount: whitespace tokens; empty -> 0") {
    assert(one(Text.tokenCount(col("t")), "a b  c").getInt(0) === 3)
    assert(one(Text.tokenCount(col("t")), "   ").getInt(0) === 0)
  }

  test("tokenOccurrences counts whole tokens only, including adjacent repeats") {
    val n = Text.normText(col("t"))
    assert(one(Text.tokenOccurrences(n, "the"), "the theme of the day").getInt(0) === 2)
    // the replace-length trick undercounted this as 1
    assert(one(Text.tokenOccurrences(n, "the"), "the the the").getInt(0) === 3)
  }

  test("langId: marker argmax with en>de>fr precedence, und on zero") {
    assert(one(Text.langId(col("t")), "the cat and the hat").getString(0) === "en")
    assert(one(Text.langId(col("t")), "der Hund und die Katze").getString(0) === "de")
    assert(one(Text.langId(col("t")), "le chat et la mer").getString(0) === "fr")
    assert(one(Text.langId(col("t")), "xyzzy plugh").getString(0) === "und")
  }

  test("qualityScore bounded in [0,1]; zero tokens -> 0") {
    val q = one(Text.qualityScore(col("t")), "some reasonably long unique text here").getDouble(0)
    assert(q > 0.0 && q <= 1.0)
    assert(one(Text.qualityScore(col("t")), "").getDouble(0) === 0.0)
  }

  test("fingerprint: equal normalized content -> equal md5") {
    val fp1 = one(Text.fingerprint(col("t")), " A  b ").getString(0)
    val fp2 = one(Text.fingerprint(col("t")), "a b").getString(0)
    assert(fp1 === fp2)
  }

  test("minhash: deterministic, similarity-ordered") {
    val a = Text.minHashSignature("the quick brown fox jumps over the lazy dog")
    val a2 = Text.minHashSignature("the quick brown fox jumps over the lazy dog")
    val near = Text.minHashSignature("the quick brown fox jumps over the lazy cat")
    val far = Text.minHashSignature("completely unrelated content about spark engines")
    assert(a.toSeq === a2.toSeq)
    def matches(x: Array[Long], y: Array[Long]) = x.zip(y).count { case (p, q) => p == q }
    assert(matches(a, near) > matches(a, far))
    assert(a.length === Text.MinHashK)
  }

  test("lsh buckets: identical sigs share all buckets; near-dup shares >=1") {
    val a = Text.minHashSignature("spark catalyst tungsten codegen pipeline engine design")
    val near = Text.minHashSignature("spark catalyst tungsten codegen pipeline engine design extra")
    assert(Text.lshBuckets(a).toSeq === Text.lshBuckets(a).toSeq)
    assert(Text.lshBuckets(a).intersect(Text.lshBuckets(near)).nonEmpty)
  }

  test("winnowing guarantee: a shared run >= w + n - 1 chars shares a fingerprint") {
    import spark.implicits._
    // docs share the 20-char run "common shared words!" (> 4 + 5 - 1 = 8)
    val df = Seq(
      (1L, "prefix one common shared words! suffix a"),
      (2L, "other text common shared words! tail bbb"),
      (3L, "completely unrelated content here nothing")
    ).toDF("doc_id", "text")
      .select(col("doc_id"),
        Text.winnowFingerprints(Text.normText(col("text"))).as("fps"))
    val m = df.collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(m(1L).intersect(m(2L)).nonEmpty, "shared run must share a fingerprint")
    assert(m(1L).intersect(m(3L)).isEmpty ||
      m(1L).intersect(m(3L)).size < m(1L).intersect(m(2L)).size)
    // identical content -> identical fingerprint set
    val same = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
      .select(Text.winnowFingerprints(Text.normText(col("text"))).as("fps"))
      .collect().map(_.getSeq[String](0).toSet)
    assert(same(0) === same(1))
  }

  test("near-dup bucket join stays bounded under boilerplate collapse") {
    // 500 identical docs share EVERY band bucket — the q51 shape that would
    // go quadratic; the big-bucket salt must keep groups ~cap-sized
    import spark.implicits._
    val docs = (0 until 500).map(i =>
      (i.toLong, "the same boilerplate footer text appears on every page"))
      .toDF("doc_id", "text")
    val all = docs
      .withColumn("sig", TextFunctions.minhash(Text.normText(col("text"))))
      .withColumn("bucket", explode(TextFunctions.lsh_bands(col("sig"))))
    val salted = Vectors.saltBuckets(all, "bucket", "doc_id", cap = 50)
    val maxGroup = salted.groupBy("bucket", "__salt").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(maxGroup <= 100, s"max salted group $maxGroup exceeds 2*cap")
    assert(salted.count() === all.count())
  }

  test("simhash: hamming 0 to self; closer for near-dup than for unrelated") {
    val a = Text.simHash64("alpha beta gamma delta epsilon zeta eta theta")
    val near = Text.simHash64("alpha beta gamma delta epsilon zeta eta iota")
    val far = Text.simHash64("entirely different words everywhere in this one")
    assert(Text.hamming64(a, a) === 0)
    assert(Text.hamming64(a, near) < Text.hamming64(a, far))
  }
}
