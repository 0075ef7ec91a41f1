package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-sampling operators a training-data pipeline runs after cleaning:
  * deterministic train/val/test splits and per-group quota caps. Both are
  * shaped for the 100 TB case — the split is a pure per-row expression (no
  * RNG state, no shuffle) and the cap never sorts a whole group in one
  * task. Reference analog: musif's corpus slicing (`limit_files` /
  * `exclude_files`, `/root/reference/musif/extract/extract.py:184-189`)
  * selects a deterministic subset of entities the same way.
  */
object Sampling {

  /** Uniform-[0,1) fraction from the md5-52 of `id || ':' || salt` — the
    * split coordinate. Pure expression: reproducible across runs, cluster
    * sizes, and engines (md5 is DuckDB-mirrorable). 13 hex chars = 52
    * bits, NOT more: a 52-bit integer is exact in double and hp/2^52 is
    * strictly below 1.0, whereas a 56-bit value near the top of the range
    * rounds UP to 2^56 in the long→double cast and the fraction lands
    * exactly on 1.0, violating [0,1). Re-hashing with a different salt
    * yields an independent split. */
  def splitFraction(id: Column, salt: String): Column =
    conv(substring(md5(concat(id.cast("string"), lit(":" + salt))), 1, 13), 16, 10)
      .cast("long").cast("double") / lit((1L << 52).toDouble)

  /** Deterministic hash split: adds a `split` column with the first label
    * whose cumulative weight share exceeds the row's [[splitFraction]].
    * Stable by id — re-running over a grown corpus never moves an existing
    * row between splits, the property eval-holdout hygiene depends on.
    * Weights are normalized internally; the last label absorbs the top of
    * the range so every row is assigned. */
  def hashSplit(df: DataFrame, id: Column, weights: Seq[(String, Double)],
                salt: String = "split"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "hashSplit needs at least one positive weight")
    df.withColumn("split", splitExpr(splitFraction(id, salt), weights))
  }

  /** The CASE chain over precomputed cumulative thresholds — exposed so an
    * oracle can interpolate the SAME Scala-computed partial sums: for
    * weights whose running sums aren't exactly representable (1/3, 0.7+0.2,
    * …) a hand-written decimal threshold would disagree with the engine's
    * double by ~1e-16, misclassifying the rare row that lands in the gap. */
  def cumulativeShares(weights: Seq[(String, Double)]): Seq[Double] = {
    val total = weights.map(_._2).sum
    weights.map(_._2).scanLeft(0.0)(_ + _).tail.map(_ / total)
  }

  private def splitExpr(frac: Column, weights: Seq[(String, Double)]): Column =
    if (weights.size == 1) lit(weights.head._1)
    else {
      val cums = cumulativeShares(weights)
      val first = when(frac < cums.head, weights.head._1)
      weights.zip(cums).slice(1, weights.size - 1)
        .foldLeft(first) { case (acc, ((label, _), hi)) =>
          acc.when(frac < hi, label)
        }
        .otherwise(weights.last._1)
    }

  /** Exact top-k per group WITHOUT a single-task per-group sort (the q06
    * scale lesson: `row_number` over a low-cardinality group key sorts each
    * whole group in one task). Phase 1 ranks within (group, salt) — `salts`
    * parallel partial sorts of ~|group|/salts rows — and keeps k per salt;
    * the global top-k is contained in that union, so phase 2's final rank
    * runs over at most k·salts rows per group regardless of group size.
    *
    * `order` must be a TOTAL order (append a unique id as the last key) or
    * ranks at ties are nondeterministic; `saltBy` must be deterministic row
    * content (an id column), never a partition-dependent value, so the salt
    * assignment — and therefore the plan — is reproducible. Emits `rank`
    * (1..k). */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], order: Seq[Column],
                   saltBy: Column, k: Int, salts: Int = 32): DataFrame = {
    require(k > 0 && salts > 0, "topKPerGroup needs k > 0 and salts > 0")
    val gs = groupCols.map(col)
    val w1 = Window.partitionBy(gs :+ col("__salt"): _*).orderBy(order: _*)
    val partial = df
      .withColumn("__salt", pmod(xxhash64(saltBy), lit(salts.toLong)))
      .withColumn("__r", row_number().over(w1))
      .where(col("__r") <= k)
      .drop("__r")
    val w2 = Window.partitionBy(gs: _*).orderBy(order: _*)
    partial.withColumn("rank", row_number().over(w2))
      .where(col("rank") <= k)
      .drop("__salt")
  }

  /** Training-sequence packing (the GPT-style pack-and-chunk pretraining
    * layout): concatenate each hash-bucket's document stream in id order
    * and cut every `budget` tokens. Adds `bucket` (md5-56 of the id mod
    * `nBuckets` — cross-engine reproducible, id-stable), `pack_id` /
    * `pack_offset` (where the doc's token stream starts), and `n_chunks`
    * (how many budget-sized chunks the doc spans; 0 for empty docs).
    *
    * All arithmetic is exact-integer (`div`, not floating floor). Scale
    * shape: ONE running-sum window per bucket — bucket count is the
    * parallelism knob (set it ≈ shuffle width at scale); no global sort,
    * no driver state, and a grown corpus only ever appends to the tail of
    * each bucket's existing packs (ids hash to stable buckets). */
  def packSequences(df: DataFrame, id: Column, tokens: Column,
                    nBuckets: Int, budget: Long): DataFrame = {
    require(nBuckets > 0 && budget > 0,
      "packSequences needs nBuckets > 0 and budget > 0")
    val w = Window.partitionBy(col("bucket")).orderBy(id)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("bucket",
        pmod(conv(substring(md5(id.cast("string")), 1, 14), 16, 10)
          .cast("long"), lit(nBuckets.toLong)))
      .withColumn("__toks", tokens.cast("long"))
      .withColumn("__start", coalesce(sum(col("__toks")).over(w), lit(0L)))
      .withColumn("pack_id", expr(s"__start div $budget"))
      .withColumn("pack_offset", pmod(col("__start"), lit(budget)))
      .withColumn("n_chunks", when(col("__toks") === 0, lit(0L)).otherwise(
        expr(s"(__start + __toks - 1) div $budget") -
          col("pack_id") + 1L))
      .drop("__toks", "__start")
  }
}
