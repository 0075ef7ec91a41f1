package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole forked test JVM — per-suite
  * sessions would pay ~5s JVM+context spin-up each. */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("musifspark-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  /** Sorted row-set comparison with elementwise tolerance for doubles
    * (aggregation order may differ between plans — the allclose gate). */
  def assertSameRows(a: DataFrame, b: DataFrame, tol: Double = 1e-9): Unit = {
    assert(a.columns.sorted.sameElements(b.columns.sorted),
      s"schema mismatch: ${a.columns.mkString(",")} vs ${b.columns.mkString(",")}")
    val cols = a.columns.sorted.toSeq
    val ra = a.select(cols.head, cols.tail: _*).collect().sortBy(_.toString)
    val rb = b.select(cols.head, cols.tail: _*).collect().sortBy(_.toString)
    assert(ra.length == rb.length, s"row count ${ra.length} vs ${rb.length}")
    ra.zip(rb).foreach { case (x, y) => assertRowClose(x, y, tol) }
  }

  def assertRowClose(x: Row, y: Row, tol: Double): Unit = {
    assert(x.length == y.length, s"arity: $x vs $y")
    (0 until x.length).foreach { i =>
      (x.get(i), y.get(i)) match {
        case (a: Double, b: Double) =>
          assert(math.abs(a - b) <= tol * math.max(1.0, math.abs(b)),
            s"col $i: $a vs $b in\n$x\n$y")
        case (a, b) => assert(a == b, s"col $i: $a vs $b in\n$x\n$y")
      }
    }
  }
}
