package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time ("as-of") join: every left row picks up the state
  * columns of the single right row with the same key and the LATEST
  * `right.ts <= left.ts` (inclusive), or nulls if no right row
  * precedes it — joining events against versioned dimension state
  * (user tier at click time, price at trade time).
  *
  * Spark-first shape: no per-row range probe and no broadcast of the
  * full right history — both sides are UNIONED with a side tag and a
  * single window partitioned by key, ordered by (ts, side), carries
  * the last non-null state forward (`last(..., ignoreNulls)` over
  * unbounded-preceding..current). One shuffle keyed on the join key,
  * linear in |left| + |right|; right rows sort before left rows at
  * equal timestamps, so the inclusive bound holds. The window
  * partitions by JOIN KEY (not empty), so parallelism is the key
  * cardinality — skewed hot keys inherit the usual salting caveats.
  *
  * Right rows must be unique per (key, ts) — pre-aggregate if your
  * changelog can emit same-instant updates.
  */
object AsOf {

  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, stateCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val clash = stateCols.intersect(leftCols)
    require(clash.isEmpty,
      s"state columns ${clash.mkString(",")} collide with left columns — rename one side")
    val stateTypes = stateCols.map(c => c -> right.schema(c).dataType)
    val lPacked = left.select(
      Seq(col(keyCol).as("_k"), col(tsCol).as("_ts"), lit(1).as("_side"),
        struct(leftCols.map(col): _*).as("_l")) ++
        stateTypes.map { case (c, t) => lit(null).cast(t).as(c) }: _*)
    val rPacked = right.select(
      Seq(col(keyCol).as("_k"), col(tsCol).as("_ts"), lit(0).as("_side"),
        lit(null).cast(lPacked.schema("_l").dataType).as("_l")) ++
        stateCols.map(col): _*)
    val w = Window.partitionBy("_k")
      .orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lPacked.unionByName(rPacked)
      .select(Seq(col("_side"), col("_l")) ++
        stateCols.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
      .filter(col("_side") === 1)
      .select(leftCols.map(c => col(s"_l.$c").as(c)) ++ stateCols.map(col): _*)
  }
}
