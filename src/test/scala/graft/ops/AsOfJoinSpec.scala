package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge-case battery for the point-in-time join (SURVEY.md §5 item 1):
  * ties at equal ts, entities with no label yet, leakage-freedom, duplicate
  * build keys, null-payload left semantics. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def probe = Seq(
    // (entity, ts, event_id)
    (1L, ts("2024-01-01 00:10:00"), "e1"),
    (1L, ts("2024-01-01 00:20:00"), "e2"),
    (1L, ts("2024-01-01 00:30:00"), "e3"),
    (2L, ts("2024-01-01 00:05:00"), "e4"), // entity with zero labels
    (3L, ts("2024-01-01 00:01:00"), "e5")  // before that entity's first label
  ).toDF("entity", "ts", "event_id")

  private def build = Seq(
    // (entity, label_ts, label, weight)
    (1L, ts("2024-01-01 00:10:00"), "A", 1.0), // exactly at e1 -> visible
    (1L, ts("2024-01-01 00:15:00"), "B", 2.0), // latest before e2/e3
    (1L, ts("2024-01-01 00:40:00"), "Z", 9.0), // after everything: leakage trap
    (3L, ts("2024-01-01 00:02:00"), "C", 3.0)  // after e5 -> e5 gets null
  ).toDF("entity", "label_ts", "label", "weight")

  private def run(p: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
    AsOfJoin.asOf(p, b, "entity", "ts", "label_ts", Seq("label", "weight"))
      .select("event_id", "label", "weight")
      .collect().map(r => (r.getString(0), r.get(1), r.get(2))).toSet

  test("as-of semantics: <= bound, latest wins, left-null, no leakage") {
    assert(run(probe, build) === Set(
      ("e1", "A", 1.0),   // label exactly at probe ts IS visible (<=)
      ("e2", "B", 2.0),   // latest at-or-before wins
      ("e3", "B", 2.0),   // future label Z never leaks
      ("e4", null, null), // entity with no labels -> left semantics
      ("e5", null, null)  // label strictly after the probe -> null
    ))
  }

  test("duplicate (entity, ts) build rows dedupe deterministically (max struct)") {
    val dup = build.unionByName(
      Seq((1L, ts("2024-01-01 00:15:00"), "B2", 1.5)).toDF("entity", "label_ts", "label", "weight"))
    val got = run(probe, dup)
    // max(struct(label, weight)): "B2" > "B" lexicographically
    assert(got.contains(("e2", "B2", 1.5)) && got.contains(("e3", "B2", 1.5)))
  }

  test("leakage-freedom property: adding future labels changes nothing") {
    val future = Seq(
      (1L, ts("2030-01-01 00:00:00"), "FUT", 99.0),
      (2L, ts("2030-01-01 00:00:00"), "FUT", 99.0)
    ).toDF("entity", "label_ts", "label", "weight")
    assert(run(probe, build) === run(probe, build.unionByName(future)))
  }

  test("probe rows and columns are fully preserved") {
    val out = AsOfJoin.asOf(probe, build, "entity", "ts", "label_ts", Seq("label"))
    assert(out.count() === probe.count())
    assert(out.columns.toSeq === Seq("entity", "ts", "event_id", "label"))
  }

  test("result is invariant to input partitioning") {
    val a = run(probe.repartition(1), build.repartition(7))
    val b = run(probe.repartition(5), build.repartition(2))
    assert(a === b)
  }
}
