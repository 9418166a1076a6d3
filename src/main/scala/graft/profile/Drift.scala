package graft.profile

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Distribution drift between two snapshots of a table (deploy
  * before/after, week over week, source A vs source B) — the
  * monitoring generalization of the reference's before/after DQ
  * comparison (home.py:41-52): not just "did the score change" but
  * "which column's DISTRIBUTION moved, and how much", scored with the
  * population stability index (PSI = Σ (p−q)·ln(p/q) over categories;
  * < 0.1 stable, 0.1-0.25 drifting, > 0.25 shifted).
  *
  * Scale shape: ALL requested columns profile in ONE scan per
  * snapshot — each row explodes to (column, value) pairs and a single
  * map-side-combined groupBy counts them; per-column totals are a
  * column-count-sized dimension joined back by broadcast (no window,
  * no per-column job). PSI terms are quantized to nano-units and
  * summed as longs, so the score is reduction-order- and
  * engine-independent (same discipline as TokenStats.crossEntropy).
  */
object Drift {

  private def shares(df: DataFrame, cols: Seq[String], pName: String): DataFrame = {
    val kvs = explode(array(cols.map(c =>
      struct(lit(c).as("column"),
        coalesce(col(c).cast("string"), lit("<null>")).as("value"))): _*)).as("kv")
    val counts = df.select(kvs)
      .select(col("kv.column").as("column"), col("kv.value").as("value"))
      .groupBy("column", "value").agg(count(lit(1)).as("cnt"))
    val totals = counts.groupBy("column").agg(F.sum(col("cnt")).as("total"))
    counts.join(broadcast(totals), "column")
      .select(col("column"), col("value"),
        (col("cnt") / col("total")).as(pName))
  }

  /** Per-(column, value) share shift: (column, value, p_before,
    * p_after, delta). Categories absent from one side carry share 0.
    */
  def valueShifts(before: DataFrame, after: DataFrame,
                  cols: Seq[String]): DataFrame =
    shares(before, cols, "p_before")
      .join(shares(after, cols, "p_after"), Seq("column", "value"), "full_outer")
      .select(col("column"), col("value"),
        round(coalesce(col("p_before"), lit(0.0)), 6).as("p_before"),
        round(coalesce(col("p_after"), lit(0.0)), 6).as("p_after"),
        round(coalesce(col("p_after"), lit(0.0))
          - coalesce(col("p_before"), lit(0.0)), 6).as("delta"))

  /** Per-column PSI. Categories missing on one side take share
    * `eps` (the standard zero-replacement). Each term
    * `(p−q)·ln(p/q)` is quantized to nano-units (a long) before the
    * per-column sum, making the score exact under any reduction
    * order.
    */
  def categoricalPsi(before: DataFrame, after: DataFrame, cols: Seq[String],
                     eps: Double = 1e-6): DataFrame = {
    val joined = shares(before, cols, "p")
      .join(shares(after, cols, "q"), Seq("column", "value"), "full_outer")
    val p2 = coalesce(col("p"), lit(eps))
    val q2 = coalesce(col("q"), lit(eps))
    joined
      .select(col("column"),
        round((p2 - q2) * log(p2 / q2) * 1e9).cast("long").as("term_nano"))
      .groupBy("column")
      .agg(count(lit(1)).as("n_categories"),
        round((F.sum(col("term_nano"))).cast("double") / 1e9, 4).as("psi"))
  }
}
