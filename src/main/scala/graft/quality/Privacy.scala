package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy-risk profiling (SURVEY §2 D71) — the compliance screen a
  * training-data pipeline runs alongside D18's PII redaction:
  * k-anonymity (Sweeney 2002) asks whether any combination of
  * quasi-identifier values isolates fewer than k rows (a
  * re-identifiable cell); l-diversity (Machanavalli et al. 2007)
  * additionally asks whether a small cell's SENSITIVE attribute is
  * homogeneous (k-anonymous but still disclosing).
  *
  * Scale shape: ONE map-side-combined groupBy on the QI tuple —
  * ≤ |QI cells| rows cross the exchange — then either a bounded
  * rollup (report) or a below-k filter (drill-down). Null QI values
  * form their own group (SQL GROUP BY semantics, identical in both
  * engines); null sensitive values count as one value (the A18/D71
  * shared null rule: NULL-and-'x' in a cell IS diversity 2).
  */
object Privacy {

  /** Below-k QI cells with size and l-diversity of `sensitive` —
    * the re-identifiable cells a release would have to suppress or
    * generalize. Output: qiCols…, grp_size, l_div.
    */
  def riskGroups(df: DataFrame, qiCols: Seq[String], sensitive: String,
                 k: Int): DataFrame = {
    require(qiCols.nonEmpty, "riskGroups: need >= 1 quasi-identifier column")
    require(k > 1, s"riskGroups: k must be > 1, got $k")
    df.groupBy(qiCols.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("grp_size"),
        (countDistinct(col(sensitive)) +
          max(when(col(sensitive).isNull, 1).otherwise(0))).as("l_div"))
      .filter(col("grp_size") < k)
      .orderBy(qiCols.map(col).toIndexedSeq: _*)
  }

  /** One-row k-anonymity report: total rows, QI cells, cells below k,
    * rows at risk (in below-k cells), the minimum cell size (the
    * dataset's actual k), and the tie-safe 2-dp at-risk percentage.
    */
  def kAnonymityReport(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame = {
    require(qiCols.nonEmpty, "kAnonymityReport: need >= 1 QI column")
    require(k > 1, s"kAnonymityReport: k must be > 1, got $k")
    df.groupBy(qiCols.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("_sz"))
      .agg(
        coalesce(sum(col("_sz")), lit(0L)).as("total_rows"),
        count(lit(1)).as("qi_cells"),
        count(when(col("_sz") < k, 1)).as("cells_below_k"),
        coalesce(sum(when(col("_sz") < k, col("_sz"))), lit(0L))
          .as("rows_at_risk"),
        coalesce(min(col("_sz")), lit(0L)).as("min_cell_size"))
      .select(col("total_rows"), col("qi_cells"), col("cells_below_k"),
        col("rows_at_risk"), col("min_cell_size"),
        (expr("(2*rows_at_risk*10000 + greatest(total_rows, 1L))" +
          " DIV (2*greatest(total_rows, 1L))") / 100.0).as("risk_pct"))
  }
}
