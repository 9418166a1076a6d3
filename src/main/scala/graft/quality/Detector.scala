package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-level quality detection + DQ scoring (reference:
  * home.py:94-111 useless/duplicated rows, 1132-1190 scoring,
  * 41-52/1139-1150 before-after summary tables).
  *
  * All reports are single-pass aggregations or hash-shuffled
  * group-bys on the interesting key only — nothing collects to the
  * driver, so the same code runs on 100 TB inputs.
  */
object Detector {

  /** Rows with more than half their columns null (home.py:94-98). */
  def uselessRows(df: DataFrame): DataFrame = {
    val nullCnt = df.columns
      .map(c => when(col(c).isNull, 1).otherwise(0))
      .reduce(_ + _)
    df.withColumn("null_col_count", nullCnt)
      .filter(col("null_col_count") > df.columns.length / 2)
  }

  /** Full-row duplicate groups with multiplicity (home.py:100-110).
    * Hash group-by on all columns: one shuffle keyed by the full row,
    * map-side combined; never materializes a sort of the whole data.
    */
  def duplicateRows(df: DataFrame): DataFrame =
    df.groupBy(df.columns.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("dup_count"))
      .filter(col("dup_count") > 1)

  /** Values of `key` appearing more than once (home.py:255-263
    * "Duplicated Data Detector").
    */
  def duplicatesByKey(df: DataFrame, key: String): DataFrame =
    df.groupBy(col(key))
      .agg(count(lit(1)).as("dup_count"))
      .filter(col("dup_count") > 1)
      .orderBy(desc("dup_count"), asc(key))

  /** DQ score band label (home.py:1175-1189 gauge arrow). */
  def band(score: Column): Column =
    when(score <= 25, "VERY LOW")
      .when(score <= 50, "LOW")
      .when(score <= 75, "MEDIUM")
      .otherwise("HIGH")

  /** Column DQ report (home.py:1132-1138): null records,
    * out-of-format records (violating any rule), proper records, and
    * score = proper/total*100. One aggregation pass.
    */
  def dqReport(df: DataFrame, column: String, rules: Seq[Rule]): DataFrame = {
    val c = col(column)
    val viol = Rule.anyViolation(c, rules)
    df.agg(
        count(lit(1)).as("total"),
        count(when(c.isNull, 1)).as("null_records"),
        count(when(c.isNotNull && viol, 1)).as("out_of_format_records"))
      .select(
        lit(column).as("column"),
        col("null_records"),
        col("out_of_format_records"),
        (col("total") - col("null_records") - col("out_of_format_records"))
          .as("proper_format_records"),
        round(when(col("total") > 0,
          (col("total") - col("null_records") - col("out_of_format_records"))
            * 100.0 / col("total")), 2).as("dq_score"))
      .withColumn("dq_band", band(col("dq_score")))
  }

  /** Multi-column DQ report in a single scan: one row per (column,
    * rule set) pair — the engine-side equivalent of filling the
    * reference's Before/After summary table column by column.
    */
  def dqSummary(df: DataFrame, specs: Seq[(String, Seq[Rule])]): DataFrame = {
    val perCol = specs.map { case (name, rules) =>
      val c = col(name)
      val viol = Rule.anyViolation(c, rules)
      struct(
        lit(name).as("column"),
        count(when(c.isNull, 1)).as("null_records"),
        count(when(c.isNotNull && viol, 1)).as("out_of_format_records"),
        count(lit(1)).as("total"))
    }
    df.agg(array(perCol.toIndexedSeq: _*).as("_c"))
      .select(explode(col("_c")).as("c"))
      .select(
        col("c.column").as("column"),
        col("c.null_records").as("null_records"),
        col("c.out_of_format_records").as("out_of_format_records"),
        (col("c.total") - col("c.null_records") - col("c.out_of_format_records"))
          .as("proper_format_records"),
        round(when(col("c.total") > 0,
          (col("c.total") - col("c.null_records") - col("c.out_of_format_records"))
            * 100.0 / col("c.total")), 2).as("dq_score"))
      .withColumn("dq_band", band(col("dq_score")))
      .orderBy("column")
  }

  /** Before/after comparison: join the two summaries on column name
    * (home.py Review Summary Report).
    */
  def beforeAfter(before: DataFrame, after: DataFrame): DataFrame =
    before.select(col("column"), col("dq_score").as("before_score"))
      .join(after.select(col("column"), col("dq_score").as("after_score")), "column")
      .withColumn("delta", round(col("after_score") - col("before_score"), 2))
      .orderBy("column")

  /** Before/after comparison in ONE scan: when the repair is
    * expressible as per-row Column transforms (`repairs`), the
    * "after" metrics are computed from the repaired expression inside
    * the same aggregation as the "before" metrics — one pass over the
    * data instead of two full scans joined afterwards. Identical
    * output to `beforeAfter(dqSummary(df), dqSummary(repaired df))`.
    */
  def beforeAfterOneScan(df: DataFrame, specs: Seq[(String, Seq[Rule])],
                         repairs: Map[String, Column]): DataFrame = {
    val perCol = specs.map { case (name, rules) =>
      val b = col(name)
      val a = repairs.getOrElse(name, col(name))
      def nulls(c: Column) = count(when(c.isNull, 1))
      def oof(c: Column) = count(when(c.isNotNull && Rule.anyViolation(c, rules), 1))
      struct(
        lit(name).as("column"), count(lit(1)).as("total"),
        nulls(b).as("b_null"), oof(b).as("b_oof"),
        nulls(a).as("a_null"), oof(a).as("a_oof"))
    }
    def score(n: Column, o: Column, total: Column): Column =
      // guarded: ANSI 0/0 on an empty table is a runtime error
      round(when(total > 0, (total - n - o) * 100.0 / total), 2)
    df.agg(array(perCol.toIndexedSeq: _*).as("_c"))
      .select(explode(col("_c")).as("c"))
      .select(
        col("c.column").as("column"),
        score(col("c.b_null"), col("c.b_oof"), col("c.total")).as("before_score"),
        score(col("c.a_null"), col("c.a_oof"), col("c.total")).as("after_score"))
      .withColumn("delta", round(col("after_score") - col("before_score"), 2))
      .orderBy("column")
  }
}
