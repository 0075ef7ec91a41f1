package graft.ops

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}
import java.sql.Timestamp

/** Property-based as-of correctness (SURVEY.md §5 item 3): both engine
  * formulations (union+window and the custom merge exec) must agree with a
  * brute-force in-memory reference on randomized inputs covering ties,
  * duplicates, unlabeled entities, and unordered arrival. Raw ScalaCheck
  * runner (the scalatest bridge artifact isn't in the offline cache). */
class AsOfPropertySpec extends SparkSpec {
  import spark.implicits._

  private val base = ts("2024-01-01 00:00:00").getTime

  // small domains force collisions: entity ties, equal timestamps
  private val genProbe = Gen.listOfN(30, for {
    e <- Gen.choose(0L, 4L)
    t <- Gen.choose(0L, 20L)
  } yield (e, t))

  private val genBuild = Gen.listOfN(12, for {
    e <- Gen.choose(0L, 5L)
    t <- Gen.choose(0L, 20L)
    v <- Gen.choose(0, 99)
  } yield (e, t, v))

  /** Brute force: latest build value with (entity==, ts<=), ties on build ts
    * resolved by MAX value (the engine's dedupeLatest=max-struct rule). */
  private def reference(probe: List[(Long, Long)], build: List[(Long, Long, Int)])
      : Map[(Long, Long), Option[Int]] =
    probe.distinct.map { case (e, t) =>
      val cands = build.filter(b => b._1 == e && b._2 <= t)
      (e, t) -> (if (cands.isEmpty) None
                 else {
                   val maxTs = cands.map(_._2).max
                   Some(cands.filter(_._2 == maxTs).map(_._3).max)
                 })
    }.toMap

  private def agrees(probe: List[(Long, Long)], build: List[(Long, Long, Int)]): Boolean = {
    val pdf = probe.zipWithIndex
      .map { case ((e, t), i) => (e, new Timestamp(base + t * 1000), i.toLong) }
      .toDF("entity", "ts", "row_id")
    val bdf = build
      .map { case (e, t, v) => (e, new Timestamp(base + t * 1000), v) }
      .toDF("entity", "label_ts", "v")
    val exp = reference(probe, build)

    def ok(df: org.apache.spark.sql.DataFrame): Boolean = {
      val got = df.collect().map { r =>
        val rid = r.getAs[Long]("row_id").toInt
        val (e, t) = probe(rid)
        ((e, t), if (r.isNullAt(r.fieldIndex("v"))) None else Some(r.getAs[Int]("v")))
      }
      got.length == probe.length && got.forall { case (k, v) => v == exp(k) }
    }
    ok(AsOfJoin.asOf(pdf, bdf, "entity", "ts", "label_ts", Seq("v"))) &&
      ok(AsOfJoin.asOfSortMerge(pdf, bdf, "entity", "ts", "label_ts", Seq("v")))
  }

  test("both as-of formulations match the brute-force reference (randomized)") {
    val prop = Prop.forAll(genProbe, genBuild) { (p, b) => p.isEmpty || agrees(p, b) }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }
}
