package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.{AsOfJoin, Stats}
import Q._

/** Join operator family (SURVEY.md §2.3): as-of/point-in-time join (J1),
  * range join (J2), broadcast dimension join (J6), semi/anti (O7), pairwise
  * self-join (J5). */
object JoinQueries {

  val queries: Map[String, QueryFn] = Map(
    // J1: the crown jewel — as-of join, events probe orders build on
    // (user, ts). Latest order at-or-before each event ts, left semantics.
    "q10_asof_join" -> ((s, dir) => {
      val events = t(s, dir, "events")
      val orders = t(s, dir, "orders")
        .select(col("o_custkey").as("user_id"), col("o_orderdate"),
          col("o_orderkey"), col("o_totalprice"))
      AsOfJoin.asOf(events, orders,
          entityCol = "user_id", probeTs = "ts", buildTs = "o_orderdate",
          payloadCols = Seq("o_orderkey", "o_totalprice"))
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("ts_sec"),
          col("o_orderkey"), r2(col("o_totalprice")).as("o_totalprice"))
    }),

    // J1b: the same as-of join through the custom Catalyst
    // AsOfMergeJoinExec (sort-merge with inequality pruning) — verified
    // against the identical DuckDB ASOF oracle as the window formulation.
    // Probe is pre-projected: the custom node is opaque to column pruning.
    "q10b_asof_merge" -> ((s, dir) => {
      val events = t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"))
      val orders = t(s, dir, "orders")
        .select(col("o_custkey").as("user_id"), col("o_orderdate"),
          col("o_orderkey"), col("o_totalprice"))
      AsOfJoin.asOfSortMerge(events, orders,
          entityCol = "user_id", probeTs = "ts", buildTs = "o_orderdate",
          payloadCols = Seq("o_orderkey", "o_totalprice"))
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("ts_sec"),
          col("o_orderkey"), r2(col("o_totalprice")).as("o_totalprice"))
    }),

    // J1c: the same as-of join over CO-BUCKETED tables — the zero-exchange
    // layout path (TableSource.writeBucketed, the Iceberg bucket-transform
    // + sorted-write-order analog). Both sides are written bucketed by
    // user_id (one file per bucket, per-bucket (user_id, ts) sorted), and
    // the merge exec's ClusteredDistribution is satisfied straight off the
    // scans: the plan has NO Exchange anywhere (PlanSpec gates it) —
    // including the build-side dedup aggregate, whose (user_id, date)
    // grouping is clustered by the user_id bucketing. Write-once layout
    // cost is paid inside this query for honesty; a production corpus
    // writes it once and every downstream batch reads it shuffle-free.
    // Verified against the IDENTICAL DuckDB ASOF oracle as q10/q10b.
    "q113_bucketed_asof" -> ((s, dir) => {
      // layout cached per sf dir (deterministic path + completion marker,
      // the ScalingBench pattern): repeated Verify/Bench invocations reuse
      // one written copy instead of accumulating temp dirs, and later
      // sweeps measure the true production shape — read-only over an
      // existing layout (write-once cost paid by the first invocation)
      val tmp = s"${sys.props("java.io.tmpdir")}/graft_q113_" +
        graft.sources.TableSource.pathKey(dir)
      val done = java.nio.file.Paths.get(tmp, "__layout_complete")
      if (!java.nio.file.Files.exists(done)) {
        val events = t(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("ts"))
        val orders = t(s, dir, "orders")
          .select(col("o_custkey").as("user_id"), col("o_orderdate"),
            col("o_orderkey"), col("o_totalprice"))
        graft.sources.TableSource.writeBucketed(events, "q113_events",
          s"$tmp/events", 8, "user_id", Seq("user_id", "ts"))
        graft.sources.TableSource.writeBucketed(orders, "q113_orders",
          s"$tmp/orders", 8, "user_id", Seq("user_id", "o_orderdate"))
        java.nio.file.Files.createFile(done)
      } else {
        graft.sources.TableSource.registerBucketed(s, "q113_events",
          s"$tmp/events", 8, "user_id", Seq("user_id", "ts"))
        graft.sources.TableSource.registerBucketed(s, "q113_orders",
          s"$tmp/orders", 8, "user_id", Seq("user_id", "o_orderdate"))
      }
      AsOfJoin.asOfSortMerge(s.table("q113_events"), s.table("q113_orders"),
          entityCol = "user_id", probeTs = "ts", buildTs = "o_orderdate",
          payloadCols = Seq("o_orderkey", "o_totalprice"))
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("ts_sec"),
          col("o_orderkey"), r2(col("o_totalprice")).as("o_totalprice"))
    }),

    // J1d: as-of over PINNED snapshots of BUCKETED snapshot tables — the
    // pin + layout composition (SnapshotTable.commitBucketed/readBucketed,
    // Iceberg's bucket partition transform + snapshot isolation operating
    // together). The events corpus is committed as TWO bucketed snapshots
    // (event_id%3<>0 first, the remainder appended); the query reads the
    // PINNED first snapshot — immune to the already-landed append — and
    // the whole as-of chain plans with ZERO exchanges (PlanSpec gates it)
    // because the pinned view re-attaches the bucket metadata. DuckDB
    // replays the pin as the modulo predicate over the base table, so a
    // pin that leaked any post-pin row (or a bucketed read that dropped /
    // duplicated one) hash-mismatches against the q10-family ASOF oracle.
    "q117_pinned_bucketed_asof" -> ((s, dir) => {
      import graft.sources.SnapshotTable
      val tmp = s"${sys.props("java.io.tmpdir")}/graft_q117_" +
        graft.sources.TableSource.pathKey(dir)
      Q.cachedBuild(tmp) {
        val events = t(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("ts"))
        val orders = t(s, dir, "orders")
          .select(col("o_custkey").as("user_id"), col("o_orderdate"),
            col("o_orderkey"), col("o_totalprice"))
        val eSpec = SnapshotTable.BucketSpec(8, "user_id", Seq("user_id", "ts"))
        val oSpec = SnapshotTable.BucketSpec(8, "user_id", Seq("user_id", "o_orderdate"))
        SnapshotTable.commitBucketed(s, s"$tmp/events",
          events.where(pmod(col("event_id"), lit(3)) =!= 0), eSpec)
        SnapshotTable.commitBucketed(s, s"$tmp/events",
          events.where(pmod(col("event_id"), lit(3)) === 0), eSpec)
        SnapshotTable.commitBucketed(s, s"$tmp/orders", orders, oSpec)
      }
      AsOfJoin.asOfSortMerge(
          SnapshotTable.readBucketed(s, s"$tmp/events", Some(1L)),
          SnapshotTable.readBucketed(s, s"$tmp/orders"),
          entityCol = "user_id", probeTs = "ts", buildTs = "o_orderdate",
          payloadCols = Seq("o_orderkey", "o_totalprice"))
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("ts_sec"),
          col("o_orderkey"), r2(col("o_totalprice")).as("o_totalprice"))
    }),

    // J2: equi + range condition (ship window relative to order date)
    "q11_range_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val joined = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .withColumn("diff_days",
          floor((unix_timestamp(col("l_shipdate")) - unix_timestamp(col("o_orderdate"))) / 86400L))
        .where(col("diff_days").between(30, 90))
      joined.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), r6(avg(col("diff_days"))).as("avg_days"))
    }),

    // J6: broadcast dimension joins (small dims only, per north rule)
    "q12_broadcast_dim" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_customers"), r4(avg(col("c_acctbal"))).as("avg_acctbal"))
    }),

    // O7: left-semi / left-anti (exclude_files / resume-skip semantics)
    "q13_semi_anti" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val withO = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_with"))
      val withoutO = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_without"))
      withO.join(withoutO, Seq("c_mktsegment"), "full_outer")
        .select(col("c_mktsegment"),
          coalesce(col("n_with"), lit(0L)).as("n_with"),
          coalesce(col("n_without"), lit(0L)).as("n_without"))
    }),

    // J5: pairwise self-join (texture PartA|PartB ratio analog), i < j
    // within the same group; per-order line counts are tiny so the join
    // fans out O(k^2) with k <= 7 — bounded, no skew risk.
    "q14_pair_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_returnflag"))
      val a = li.select(col("l_orderkey"), col("l_linenumber").as("ln1"),
        col("l_quantity").as("q1"), col("l_returnflag").as("flag1"))
      val b = li.select(col("l_orderkey"), col("l_linenumber").as("ln2"),
        col("l_quantity").as("q2"), col("l_returnflag").as("flag2"))
      a.join(b, Seq("l_orderkey"))
        .where(col("ln1") < col("ln2"))
        .groupBy(col("flag1"), col("flag2"))
        .agg(count(lit(1)).as("n_pairs"),
          r6(avg(Stats.safeDiv(col("q1"), col("q2")))).as("avg_ratio"))
    }))

  val oracles: Map[String, String] = Map(
    "q10_asof_join" ->
      s"""WITH lab AS (
         | SELECT user_id, o_orderdate, o_orderkey, o_totalprice FROM (
         |  SELECT o_custkey AS user_id, o_orderdate, o_orderkey, o_totalprice,
         |   row_number() OVER (PARTITION BY o_custkey, o_orderdate
         |     ORDER BY o_orderkey DESC, o_totalprice DESC) AS rn
         |  FROM orders) WHERE rn = 1)
         |SELECT e.event_id, e.user_id, ${sqlEpoch("e.ts")} AS ts_sec,
         | l.o_orderkey, round(l.o_totalprice + 3.7e-10, 2) AS o_totalprice
         |FROM events e ASOF LEFT JOIN lab l
         | ON e.user_id = l.user_id AND e.ts >= l.o_orderdate""".stripMargin,

    "q10b_asof_merge" ->
      s"""WITH lab AS (
         | SELECT user_id, o_orderdate, o_orderkey, o_totalprice FROM (
         |  SELECT o_custkey AS user_id, o_orderdate, o_orderkey, o_totalprice,
         |   row_number() OVER (PARTITION BY o_custkey, o_orderdate
         |     ORDER BY o_orderkey DESC, o_totalprice DESC) AS rn
         |  FROM orders) WHERE rn = 1)
         |SELECT e.event_id, e.user_id, ${sqlEpoch("e.ts")} AS ts_sec,
         | l.o_orderkey, round(l.o_totalprice + 3.7e-10, 2) AS o_totalprice
         |FROM events e ASOF LEFT JOIN lab l
         | ON e.user_id = l.user_id AND e.ts >= l.o_orderdate""".stripMargin,

    // identical semantics to q10/q10b — the layout changes the PLAN
    // (zero exchanges, gated in PlanSpec), never the result
    "q113_bucketed_asof" ->
      s"""WITH lab AS (
         | SELECT user_id, o_orderdate, o_orderkey, o_totalprice FROM (
         |  SELECT o_custkey AS user_id, o_orderdate, o_orderkey, o_totalprice,
         |   row_number() OVER (PARTITION BY o_custkey, o_orderdate
         |     ORDER BY o_orderkey DESC, o_totalprice DESC) AS rn
         |  FROM orders) WHERE rn = 1)
         |SELECT e.event_id, e.user_id, ${sqlEpoch("e.ts")} AS ts_sec,
         | l.o_orderkey, round(l.o_totalprice + 3.7e-10, 2) AS o_totalprice
         |FROM events e ASOF LEFT JOIN lab l
         | ON e.user_id = l.user_id AND e.ts >= l.o_orderdate""".stripMargin,

    // the q10-family ASOF oracle over the PINNED subset: snapshot 1 holds
    // exactly the event_id%3<>0 rows, and the post-pin append must leak
    // nothing — the layout changes the plan (zero exchanges), not the rows
    "q117_pinned_bucketed_asof" ->
      s"""WITH lab AS (
         | SELECT user_id, o_orderdate, o_orderkey, o_totalprice FROM (
         |  SELECT o_custkey AS user_id, o_orderdate, o_orderkey, o_totalprice,
         |   row_number() OVER (PARTITION BY o_custkey, o_orderdate
         |     ORDER BY o_orderkey DESC, o_totalprice DESC) AS rn
         |  FROM orders) WHERE rn = 1)
         |SELECT e.event_id, e.user_id, ${sqlEpoch("e.ts")} AS ts_sec,
         | l.o_orderkey, round(l.o_totalprice + 3.7e-10, 2) AS o_totalprice
         |FROM (SELECT * FROM events WHERE event_id % 3 <> 0) e
         | ASOF LEFT JOIN lab l
         | ON e.user_id = l.user_id AND e.ts >= l.o_orderdate""".stripMargin,

    "q11_range_join" ->
      s"""SELECT o_orderpriority, count(*)::BIGINT AS n,
         | round(avg(diff_days) + 3.7e-10, 6) AS avg_days
         |FROM (
         | SELECT o_orderpriority,
         |  floor((${sqlEpoch("l_shipdate")} - ${sqlEpoch("o_orderdate")}) / 86400.0) AS diff_days
         | FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
         |WHERE diff_days BETWEEN 30 AND 90
         |GROUP BY o_orderpriority""".stripMargin,

    "q12_broadcast_dim" ->
      """SELECT r_name, count(*)::BIGINT AS n_customers,
        | round(avg(c_acctbal) + 3.7e-10, 4) AS avg_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,

    "q13_semi_anti" ->
      """WITH w AS (
        | SELECT c_mktsegment, count(*)::BIGINT AS n_with FROM customer
        | WHERE c_custkey IN (SELECT o_custkey FROM orders) GROUP BY 1),
        |wo AS (
        | SELECT c_mktsegment, count(*)::BIGINT AS n_without FROM customer
        | WHERE c_custkey NOT IN (SELECT o_custkey FROM orders) GROUP BY 1)
        |SELECT coalesce(w.c_mktsegment, wo.c_mktsegment) AS c_mktsegment,
        | coalesce(n_with, 0)::BIGINT AS n_with,
        | coalesce(n_without, 0)::BIGINT AS n_without
        |FROM w FULL OUTER JOIN wo ON w.c_mktsegment = wo.c_mktsegment""".stripMargin,

    "q14_pair_join" ->
      """SELECT a.l_returnflag AS flag1, b.l_returnflag AS flag2,
        | count(*)::BIGINT AS n_pairs,
        | round(avg(CASE WHEN b.l_quantity <> 0
        |   THEN a.l_quantity / b.l_quantity ELSE 0 END) + 3.7e-10, 6) AS avg_ratio
        |FROM lineitem a JOIN lineitem b
        | ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
        |GROUP BY 1, 2""".stripMargin)
}
