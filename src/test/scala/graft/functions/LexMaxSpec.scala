package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** lex_max must reproduce the ranked-window argmax (DESC, DESC, ... with
  * NULLS-LAST leading order) exactly — including ties on any prefix — while
  * planning as a HashAggregate. */
class LexMaxSpec extends SparkSpec {
  import spark.implicits._

  private def windowArgmax(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy(col("g"))
      .orderBy(col("a").desc, col("b").desc, col("c").desc)
    df.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("g"), col("a"), col("b"), col("c"))
  }

  private def lexArgmax(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(col("g"))
      .agg(LexMax.lexMax(col("a"), col("b"), col("c")).as("m"))
      .select(col("g"), col("m.c0").as("a"), col("m.c1").as("b"), col("m.c2").as("c"))

  test("matches the ranked-window argmax on randomized data with heavy ties") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 5000).map { i =>
      // tiny value domains force ties on every prefix
      (rnd.nextInt(4), rnd.nextInt(5).toDouble, rnd.nextInt(3).toLong, rnd.nextInt(7).toLong)
    }
    val df = rows.toDF("g", "a", "b", "c")
    assertSameRows(windowArgmax(df), lexArgmax(df))
  }

  test("single-row groups, one group, and merge across partitions") {
    val df = Seq(
      (1, 5.0, 1L, 1L), (1, 5.0, 2L, 0L), (1, 5.0, 2L, 9L),
      (2, 1.0, 0L, 0L)).toDF("g", "a", "b", "c").repartition(4)
    val got = lexArgmax(df).collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set((1, 5.0, 2L, 9L), (2, 1.0, 0L, 0L)))
  }

  test("rows with NULL key fields lose to comparable rows (DESC NULLS LAST)") {
    val df = Seq[(Int, java.lang.Double, java.lang.Long, java.lang.Long)](
      (1, null, 9L, 9L), (1, 2.0, 1L, 1L), (1, 3.0, null, 5L), (1, 3.0, 0L, 0L))
      .toDF("g", "a", "b", "c")
    val r = lexArgmax(df).collect()(0)
    // (3.0, null, 5) vs (3.0, 0, 0): struct ordering puts a NULL field below
    // any value, so (3.0, 0, 0) wins — the same DESC NULLS LAST order the
    // window analog uses, independent of arrival order.
    assert(r.getDouble(1) == 3.0 && !r.isNullAt(2) && r.getLong(2) == 0L)
  }

  test("empty input yields no groups; all-null group returns a row") {
    val empty = Seq.empty[(Int, Double, Long, Long)].toDF("g", "a", "b", "c")
    assert(lexArgmax(empty).count() == 0)
    val allNull = Seq[(Int, java.lang.Double, java.lang.Long, java.lang.Long)](
      (1, null, null, null), (1, null, null, null)).toDF("g", "a", "b", "c")
    val r = lexArgmax(allNull).collect()
    assert(r.length == 1 && r(0).isNullAt(1))
  }

  test("plans as HashAggregate (primitive buffer), never SortAggregate") {
    val df = Seq((1, 1.0, 1L, 1L)).toDF("g", "a", "b", "c")
    val plan = lexArgmax(df).queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), s"not hash-aggregated:\n$plan")
    assert(!plan.contains("SortAggregate"), s"downgraded to sort agg:\n$plan")
  }
}
