package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.{SaltedAgg, Stats}
import graft.ops.SaltedAgg._
import Q._

/** Scan / aggregation operator family (SURVEY.md §2.2, §2.4): pruned scans,
  * hash aggregation, rollup, corrected moments, trimmed stats, argmax,
  * histogram shares, zero-guard ratios, salted two-phase aggregation. */
object CoreQueries {

  val queries: Map[String, QueryFn] = Map(
    // S1/P1: projection + predicate pushdown to the parquet scan
    "q01_pruned_scan" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_quantity") < 3 &&
          col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          r2(col("l_extendedprice")).as("price"))
    }),

    // A1/A2: TPC-H Q1-style hash aggregate
    "q02_agg_core" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          r2(sum(col("l_quantity"))).as("sum_qty"),
          r2(sum(col("l_extendedprice"))).as("sum_price"),
          r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
          r6(avg(col("l_discount"))).as("avg_disc"),
          count(lit(1)).as("n"))
    }),

    // A2: multi-level rollup (part -> sound -> family analog)
    "q03_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(r2(sum(col("l_quantity"))).as("sum_qty"), count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
          col("sum_qty"), col("n"))
    }),

    // A4: bias-corrected moments (scipy bias=False == DuckDB skewness/kurtosis)
    "q04_moments" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          r6(avg(col("l_quantity"))).as("mean_qty"),
          r6(stddev_samp(col("l_quantity"))).as("std_qty"),
          r6(Stats.skewnessCorrected(col("l_quantity"))).as("skew_qty"),
          r6(Stats.kurtosisCorrected(col("l_quantity"))).as("kurt_qty"))
    }),

    // A5: scipy-style trimmed stats (floor(0.1 n) per tail)
    "q05_trimmed" -> ((s, dir) => {
      val out = Stats.trimmedStats(
        t(s, dir, "lineitem"), Seq("l_returnflag"), "l_extendedprice",
        0.1, Seq("l_orderkey", "l_linenumber"))
      out.select(col("l_returnflag"),
        r6(col("trimmed_mean")).as("trimmed_mean"),
        r6(col("trimmed_std")).as("trimmed_std"),
        col("trimmed_n"),
        r6(col("trim_diff")).as("trim_diff"),
        r6(col("trim_ratio")).as("trim_ratio"))
    }),

    // A6/O4: deterministic argmax as ONE hash aggregate — the custom
    // lex_max DeclarativeAggregate keeps the (price DESC, orderkey DESC,
    // linenumber DESC) tie-break of the old ranked-window formulation but
    // with a flat primitive buffer, so it plans as HashAggregate with
    // map-side partial aggregation and whole-stage codegen. (The obvious
    // max(struct(...)) silently downgrades to SortAggregate — struct
    // buffers aren't UnsafeRow-mutable — and a partitionBy(l_returnflag)
    // window sorts ALL rows of a ~3-value group in one task: a straggler
    // at 100x.)
    "q06_argmax" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(graft.functions.LexMax.lexMax(col("l_extendedprice"),
          col("l_orderkey"), col("l_linenumber").cast("long")).as("m"))
        .select(col("l_returnflag"), col("m.c1").as("l_orderkey"),
          col("m.c2").as("l_linenumber"),
          r2(col("m.c0")).as("max_price"))
    }),

    // A3: histogram + share-of-total. The total is a one-row aggregate
    // broadcast back onto the counts — not a global (unpartitioned) window,
    // which would funnel the whole histogram through a single task if the
    // key cardinality ever grew with the data
    "q07_histogram_share" -> ((s, dir) => {
      val counts = t(s, dir, "events").groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val total = counts.agg(sum(col("n")).as("__total"))
      counts.crossJoin(broadcast(total))
        .withColumn("share", r6(col("n").cast("double") / col("__total")))
        .drop("__total")
    }),

    // A8/F2: density ratios with musif's x/0 -> 0 convention
    "q08_density_ratio" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n"),
          r4(sum(col("value"))).as("sum_value"),
          r6(Stats.safeDiv(
            sum(col("value")),
            sum(when(col("event_type") === "purchase", 1).otherwise(0)))).as("value_per_purchase"))
    }),

    // North rule: salted two-phase aggregation == plain groupBy (oracle is
    // the plain SQL aggregate; equality proves salting correctness)
    "q09_salted_agg" -> ((s, dir) => {
      val out = SaltedAgg.saltedAgg(
        t(s, dir, "events"), Seq("user_id"), saltBy = Seq("event_id"), nSalts = 8,
        Seq(SSum("value", "sum_value"), SCount("n"),
          SMin("value", "min_value"), SMax("value", "max_value"),
          SAvg("value", "avg_value")))
      out.select(col("user_id"), r4(col("sum_value")).as("sum_value"), col("n"),
        r6(col("min_value")).as("min_value"), r6(col("max_value")).as("max_value"),
        r6(col("avg_value")).as("avg_value"))
    }))

  val oracles: Map[String, String] = Map(
    "q01_pruned_scan" ->
      """SELECT l_orderkey, l_linenumber::BIGINT AS l_linenumber,
        | round(l_extendedprice + 3.7e-10, 2) AS price
        |FROM lineitem
        |WHERE l_quantity < 3 AND l_shipdate < TIMESTAMP '1996-01-01'""".stripMargin,

    "q02_agg_core" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity) + 3.7e-10, 2) AS sum_qty,
        | round(sum(l_extendedprice) + 3.7e-10, 2) AS sum_price,
        | round(sum(l_extendedprice * (1 - l_discount)) + 3.7e-10, 2) AS sum_disc_price,
        | round(avg(l_discount) + 3.7e-10, 6) AS avg_disc,
        | count(*)::BIGINT AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q03_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
        | coalesce(l_linestatus, 'ALL') AS l_linestatus,
        | round(sum(l_quantity) + 3.7e-10, 2) AS sum_qty, count(*)::BIGINT AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,

    "q04_moments" ->
      """SELECT l_returnflag, count(*)::BIGINT AS n,
        | round(avg(l_quantity) + 3.7e-10, 6) AS mean_qty,
        | round(stddev(l_quantity) + 3.7e-10, 6) AS std_qty,
        | round(skewness(l_quantity) + 3.7e-10, 6) AS skew_qty,
        | round(kurtosis(l_quantity) + 3.7e-10, 6) AS kurt_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q05_trimmed" ->
      """WITH ranked AS (
        | SELECT l_returnflag, l_extendedprice,
        |  row_number() OVER (PARTITION BY l_returnflag
        |    ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
        |  count(*) OVER (PARTITION BY l_returnflag) AS cnt,
        |  avg(l_extendedprice) OVER (PARTITION BY l_returnflag) AS mean_all
        | FROM lineitem)
        |SELECT l_returnflag,
        | round(avg(l_extendedprice) + 3.7e-10, 6) AS trimmed_mean,
        | round(stddev(l_extendedprice) + 3.7e-10, 6) AS trimmed_std,
        | count(*)::BIGINT AS trimmed_n,
        | round(any_value(mean_all) - avg(l_extendedprice) + 3.7e-10, 6) AS trim_diff,
        | round(CASE WHEN any_value(mean_all) <> 0
        |   THEN (any_value(mean_all) - avg(l_extendedprice)) / any_value(mean_all)
        |   ELSE 0 END + 3.7e-10, 6) AS trim_ratio
        |FROM ranked
        |WHERE rn > floor(cnt * 0.1) AND rn <= cnt - floor(cnt * 0.1)
        |GROUP BY l_returnflag""".stripMargin,

    "q06_argmax" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber::BIGINT AS l_linenumber,
        | round(l_extendedprice + 3.7e-10, 2) AS max_price
        |FROM (
        | SELECT *, row_number() OVER (PARTITION BY l_returnflag
        |   ORDER BY l_extendedprice DESC, l_orderkey DESC, l_linenumber DESC) AS rn
        | FROM lineitem)
        |WHERE rn = 1""".stripMargin,

    "q07_histogram_share" ->
      """SELECT event_type, count(*)::BIGINT AS n,
        | round(count(*) / (SELECT count(*) FROM events) + 3.7e-10, 6) AS share
        |FROM events GROUP BY event_type""".stripMargin,

    "q08_density_ratio" ->
      """SELECT user_id, count(*)::BIGINT AS n,
        | round(sum(value) + 3.7e-10, 4) AS sum_value,
        | round(CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) > 0
        |   THEN sum(value) / sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |   ELSE 0 END + 3.7e-10, 6) AS value_per_purchase
        |FROM events GROUP BY user_id""".stripMargin,

    "q09_salted_agg" ->
      """SELECT user_id, round(sum(value) + 3.7e-10, 4) AS sum_value, count(*)::BIGINT AS n,
        | round(min(value) + 3.7e-10, 6) AS min_value, round(max(value) + 3.7e-10, 6) AS max_value,
        | round(avg(value) + 3.7e-10, 6) AS avg_value
        |FROM events GROUP BY user_id""".stripMargin)
}
