package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for hot keys (duplicate-phash clusters): key salting +
  * two-phase aggregation. Phase 1 aggregates on (key, salt) — hot keys fan
  * out over `nSalts` reducers — phase 2 merges the partials on key alone.
  * Results are bit-identical in row set to a plain groupBy for the algebraic
  * aggregates supported here (sum/count/min/max; avg = sum/count composed in
  * phase 2).
  *
  * The salt is derived from deterministic row content (hash of `saltBy`
  * columns), never from partition index or RNG, so results are independent
  * of parallelism.
  *
  * Note: Spark's own partial aggregation already does map-side combine; the
  * salt additionally spreads the *final* aggregation of a hot key over
  * `nSalts` reducer partitions, which matters when one key alone exceeds a
  * single task's capacity (the 100 TB case), and is AQE-independent.
  */
object SaltedAgg {

  sealed trait SaltedSpec { def col: String; def alias: String }
  case class SSum(col: String, alias: String) extends SaltedSpec
  case class SCount(alias: String) extends SaltedSpec { def col = "" }
  case class SMin(col: String, alias: String) extends SaltedSpec
  case class SMax(col: String, alias: String) extends SaltedSpec
  case class SAvg(col: String, alias: String) extends SaltedSpec

  def saltedAgg(df: DataFrame, keyCols: Seq[String], saltBy: Seq[String],
                nSalts: Int, specs: Seq[SaltedSpec]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(saltBy.map(col): _*), lit(nSalts)))

    val partials: Seq[Column] = specs.flatMap {
      case SSum(c, a)   => Seq(sum(col(c)).as(s"__sum_$a"))
      case SCount(a)    => Seq(count(lit(1)).as(s"__cnt_$a"))
      case SMin(c, a)   => Seq(min(col(c)).as(s"__min_$a"))
      case SMax(c, a)   => Seq(max(col(c)).as(s"__max_$a"))
      case SAvg(c, a)   => Seq(sum(col(c)).as(s"__avgs_$a"), count(col(c)).as(s"__avgc_$a"))
    }
    val p1 = salted
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(partials.head, partials.tail: _*)

    val finals: Seq[Column] = specs.map {
      case SSum(_, a)  => sum(col(s"__sum_$a")).as(a)
      case SCount(a)   => sum(col(s"__cnt_$a")).as(a)
      case SMin(_, a)  => min(col(s"__min_$a")).as(a)
      case SMax(_, a)  => max(col(s"__max_$a")).as(a)
      case SAvg(_, a)  => (sum(col(s"__avgs_$a")) / sum(col(s"__avgc_$a"))).as(a)
    }
    p1.groupBy(keyCols.map(col): _*).agg(finals.head, finals.tail: _*)
  }
}
