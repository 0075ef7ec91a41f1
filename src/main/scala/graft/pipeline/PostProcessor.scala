package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, NumericType}

/** Post-processing of the wide feature table — musif's `DataProcessor`
  * (`/root/reference/musif/process/processor.py:50-140`) as a chain of pure
  * DataFrame transforms:
  *
  *  - column deletion by name predicates (P4, `process/utils.py:78-126`)
  *  - all-NaN / high-NaN-ratio column drop (P4, `processor.py:192-224`)
  *  - high-NaN-ratio row drop (P5, `processor.py:217-222`)
  *  - NaN->0 fill for matching columns (P6, `processor.py:226-237`)
  *  - value recode (P7, `"NA"` -> NULL etc.)
  *  - deterministic output ordering (O2, `processor.py:309-311`)
  *  - resume-merge of two outputs (O6, `process/utils.py:234-254`)
  *
  * Column-level decisions are driver-side schema work plus ONE aggregate
  * pass for null ratios (no per-column jobs); row filters and fills are
  * narrow transforms.
  */
object PostProcessor {

  final case class ColumnDropSpec(
      exact: Seq[String] = Nil,
      startsWith: Seq[String] = Nil,
      endsWith: Seq[String] = Nil,
      contains: Seq[String] = Nil,
      regex: Seq[String] = Nil) {
    def matches(name: String): Boolean =
      exact.contains(name) ||
        startsWith.exists(name.startsWith) ||
        endsWith.exists(name.endsWith) ||
        contains.exists(name.contains) ||
        regex.exists(r => r.r.findFirstIn(name).isDefined)
  }

  /** P4: drop columns by name predicates — pure schema pruning. */
  def dropColumns(df: DataFrame, spec: ColumnDropSpec): DataFrame = {
    val keep = df.columns.filterNot(spec.matches)
    df.select(keep.map(col).toSeq: _*)
  }

  /** Null ratio per column in ONE aggregate pass. */
  def nullRatios(df: DataFrame): Map[String, Double] = {
    val n = df.columns.length
    val aggs = df.columns.map(c =>
      avg(when(col(c).isNull, 1.0).otherwise(0.0)).as(c)).toSeq
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    df.columns.zipWithIndex.map { case (c, i) =>
      c -> (if (row.isNullAt(i)) 1.0 else row.getDouble(i))
    }.toMap
  }

  /** P4: drop columns whose null ratio exceeds `maxRatio` (1.0 drops only
    * all-null columns, matching `dropna(axis=1, how='all')`). Protected
    * columns (keys) are never dropped. */
  def dropHighNullColumns(df: DataFrame, maxRatio: Double,
                          protect: Seq[String] = Nil): DataFrame = {
    val ratios = nullRatios(df)
    // maxRatio >= 1.0 == pandas dropna(how='all'): drop only fully-null cols
    val keep = df.columns.filter { c =>
      protect.contains(c) ||
        (if (maxRatio >= 1.0) ratios(c) < 1.0 else ratios(c) <= maxRatio)
    }
    df.select(keep.map(col).toSeq: _*)
  }

  /** Adaptive max-NaN-rows threshold — musif's `__main__` auto-config
    * (`/root/reference/musif/__main__.py:160-171`): when the table is sparse
    * relative to its length (columns WITHOUT any null / row count < 0.1),
    * the row threshold adapts to the observed null density —
    * `(1/0.99) * q99(per-row null count) / n_cols` (so only outlier rows
    * beyond the 99th null-count percentile drop); otherwise 1.0 (keep all).
    * Two aggregate passes (per-column null counts; exact interpolated
    * percentile of the per-row null count), no windows. */
  def adaptiveMaxNanRows(df: DataFrame): Double = {
    val cols = df.columns.toSeq
    val nCols = cols.length
    val aggs = (count(lit(1)).as("__n") +:
      cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)))).toSeq
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = row.getLong(0)
    if (n == 0L || nCols == 0) return 1.0
    val colsWithoutNa = (1 to nCols).count(i => row.getLong(i) == 0L)
    if (colsWithoutNa.toDouble / n < 0.1) {
      val nullCount = cols.map(c => when(col(c).isNull, 1).otherwise(0): Column)
        .reduce(_ + _)
      val q99 = df.select(nullCount.cast(DoubleType).as("__nc"))
        .agg(expr("percentile(__nc, 0.99)")).collect()(0).getDouble(0)
      (1.0 / 0.99) * q99 / nCols
    } else 1.0
  }

  /** P5: drop rows whose null ratio across `cols` exceeds `maxRatio`. */
  def dropHighNullRows(df: DataFrame, maxRatio: Double,
                       cols: Seq[String] = Nil): DataFrame = {
    val use = if (cols.nonEmpty) cols else df.columns.toSeq
    val nullCount = use.map(c => when(col(c).isNull, 1).otherwise(0): Column).reduce(_ + _)
    df.filter(nullCount.cast(DoubleType) / use.length <= maxRatio)
  }

  /** P6: fill nulls with `value` in numeric columns whose name contains any
    * of `substrings` (musif `replace_nans`). */
  def fillNulls(df: DataFrame, substrings: Seq[String], value: Double = 0.0): DataFrame = {
    val targets = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] &&
        substrings.exists(f.name.contains) => f.name
    }
    if (targets.isEmpty) df else df.na.fill(value, targets)
  }

  /** P7: recode a sentinel string to NULL across string columns
    * (musif's `"NA"` convention, `extract.py:367,373`). */
  def sentinelToNull(df: DataFrame, sentinel: String = "NA"): DataFrame =
    df.schema.fields.foldLeft(df) {
      case (d, f) if f.dataType.typeName == "string" =>
        d.withColumn(f.name, when(col(f.name) === sentinel, lit(null)).otherwise(col(f.name)))
      case (d, _) => d
    }

  /** One column family to merge: `target` = row-wise sum of `members`
    * (missing members are skipped; nulls count as 0 — the reference
    * fillna(0)s the family before summing). Originals are kept. */
  final case class ColumnFamily(target: String, members: Seq[String])

  /** musif `DataProcessor.group_columns` (`process/processor.py:160-172`,
    * `process/utils.py:129-225`): append per-family aggregate sum columns
    * while keeping the member columns. Families are applied in order, so a
    * later family may sum earlier targets (the reference's
    * `Key_SubD = Key_sd + Key_SD`). With `zeroFillMembers` the member
    * columns themselves are 0-filled in the output, matching the
    * reference's in-place `update(fillna(0))` before summation. */
  def groupColumnFamilies(df: DataFrame, families: Seq[ColumnFamily],
                          zeroFillMembers: Boolean = true): DataFrame = {
    val filled =
      if (zeroFillMembers) {
        val members = families.flatMap(_.members).distinct.filter(df.columns.contains)
        val numeric = df.schema.fields
          .filter(f => members.contains(f.name) && f.dataType.isInstanceOf[NumericType])
          .map(_.name)
        if (numeric.isEmpty) df else df.na.fill(0.0, numeric)
      } else df
    families.foldLeft(filled) { (d, fam) =>
      val present = fam.members.filter(d.columns.contains)
      val sumExpr =
        if (present.isEmpty) lit(0.0) // pandas df[[]].sum(axis=1) == 0.0
        else present.map(m => coalesce(col(m).cast(DoubleType), lit(0.0)): Column).reduce(_ + _)
      d.withColumn(fam.target, sumExpr)
    }
  }

  /** The reference's concrete family tables, derived from the actual column
    * set exactly like `join_keys` / `join_keys_modulatory` /
    * `join_part_degrees` (`process/utils.py:129-225`). NOTE: musif column
    * names distinguish degree case (`Key_IV` vs `Key_iv`); Spark resolves
    * names case-insensitively by default, so a table carrying both needs
    * `spark.sql.caseSensitive=true` for these families. Constants:
    * KEY_PREFIX="Harmony_Key_", KEY_PERCENTAGE="_PercentageMeasures",
    * KEY_MODULATORY="Modulatory_", DEGREE_PREFIX="Degree"
    * (`extract/features/harmony/constants.py:15-19`,
    * `extract/features/scale/constants.py:10`). */
  object MusifFamilies {
    val KeyPrefix = "Harmony_Key_"
    val KeyPct = "_PercentageMeasures"
    val Modulatory = "Modulatory_"

    /** `join_keys`: SD/sd/SubD/T/rel/Other over Key_*_PercentageMeasures. */
    def keys(columns: Seq[String]): Seq[ColumnFamily] = {
      def k(n: String) = s"$KeyPrefix$n$KeyPct"
      val sd = Seq("IV", "II", "VI").map(k)
      val sdMin = Seq("iv", "ii").map(k)
      val tonic = Seq("I", "i").map(k)
      val rel = Seq("III", "vi").map(k)
      val total = (rel ++ tonic ++ sdMin ++ sd).filter(columns.contains)
      val others = columns.filter(c =>
        c.contains(KeyPrefix) && !total.contains(c) && !c.contains(Modulatory))
      Seq(
        ColumnFamily(k("SD"), sd),
        ColumnFamily(k("sd"), sdMin),
        ColumnFamily(k("SubD"), Seq(k("sd"), k("SD"))),
        ColumnFamily(k("T"), tonic),
        ColumnFamily(k("rel"), rel),
        ColumnFamily(k("Other"), others))
    }

    /** `join_keys_modulatory`: the same shapes over Key_Modulatory_*. */
    def keysModulatory(columns: Seq[String]): Seq[ColumnFamily] = {
      def k(n: String) = s"$KeyPrefix$Modulatory$n"
      val sd = Seq("IV", "II", "VI").map(k)
      val sdMin = Seq("iv", "ii").map(k)
      val tonic = Seq("I", "i").map(k)
      val rel = Seq("III", "vi").map(k)
      val total = (rel ++ tonic ++ sdMin ++ sd).filter(columns.contains)
      val others = columns.filter(c =>
        c.contains(KeyPrefix + Modulatory) && !total.contains(c))
      Seq(
        ColumnFamily(k("SD"), sd),
        ColumnFamily(k("sd"), sdMin),
        ColumnFamily(k("SubD"), Seq(k("sd"), k("SD"))),
        ColumnFamily(k("T"), tonic),
        ColumnFamily(k("rel"), rel),
        ColumnFamily(k("Other"), others))
    }

    /** `join_part_degrees` for one part prefix (e.g. "PartVnI_"):
      * Asc(#) / Desc(b not bb) / Dasc(x) / Ddesc(bb) / Nat / Nonat. */
    def partDegrees(columns: Seq[String], part: String,
                    suffix: String = ""): Seq[ColumnFamily] = {
      val totalDegrees = columns.filter(c => c.contains("_Degree") &&
        (if (suffix.isEmpty) !c.contains("relative") else c.contains("relative")))
      val partDegrees = totalDegrees.filter(_.contains(part))
      val natRe = ("^" + java.util.regex.Pattern.quote(part) + "Degree[0-9].*").r
      val nat = partDegrees.filter(c => natRe.findFirstIn(c).isDefined)
      def fam(n: String, ms: Seq[String]) =
        ColumnFamily(s"${part}Degree_$n$suffix", ms)
      Seq(
        fam("Asc", partDegrees.filter(_.contains("#"))),
        fam("Desc", partDegrees.filter(c => c.contains("b") && !c.contains("bb"))),
        fam("Dasc", partDegrees.filter(_.contains("x"))),
        fam("Ddesc", partDegrees.filter(_.contains("bb"))),
        fam("Nat", nat),
        fam("Nonat", partDegrees.filterNot(nat.contains)))
    }
  }

  /** Instrumentation one-hot explode (`processor.py:174-190`): a
    * delimiter-joined set-valued string column becomes one 0/1 presence
    * column per category. The category domain is explicit (bounded, fixed
    * schema) — no distinct-scan. */
  def oneHotExplode(df: DataFrame, column: String, categories: Seq[String],
                    sep: String = ",", prefix: String = ""): DataFrame = {
    val toks = split(col(column), java.util.regex.Pattern.quote(sep))
    categories.foldLeft(df) { (d, c) =>
      d.withColumn(s"$prefix$c",
        when(array_contains(toks, c), 1).otherwise(0))
    }
  }

  /** delete_files_without_harmony analog (`processor.py:142-157`): drop
    * rows whose availability flag is 0 (upstream analysis missing/failed).
    * The reference masks `== 0` and keeps the complement, so NULL flags are
    * KEPT — mirrored here. No-op when the column is absent, like the
    * reference's `if HARMONY_AVAILABLE in self.data` guard. */
  def dropUnavailable(df: DataFrame, flagCol: String): DataFrame =
    if (df.columns.contains(flagCol))
      df.where(col(flagCol).isNull || col(flagCol) =!= 0)
    else df

  /** O2: deterministic row + column order for stable file output. */
  def ordered(df: DataFrame, sortCols: Seq[String]): DataFrame = {
    val dataCols = df.columns.toSeq.filterNot(sortCols.contains).sorted
    df.select((sortCols ++ dataCols).map(col): _*)
      .orderBy(sortCols.map(col): _*)
  }

  /** O6/O7: resume-merge — rows of `fresh` win over `previous` on the key
    * (anti-join old against new, then union). */
  def resumeMerge(previous: DataFrame, fresh: DataFrame, keys: Seq[String]): DataFrame =
    previous.join(fresh, keys, "left_anti").unionByName(fresh, allowMissingColumns = true)
}
