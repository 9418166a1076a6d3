package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed point-in-interval (range) join (SURVEY §2 D72): match
  * each point to every interval containing it. Spark has no native
  * range-join strategy — a naive
  * `points.join(intervals, p >= s && p <= e)` plans as a
  * BroadcastNestedLoopJoin (O(|points|·|intervals|) with a
  * broadcast-or-bust memory profile), the classic scale killer.
  *
  * This operator buckets the domain (the Flink/Databricks range-join
  * optimization, re-expressed declaratively): every interval explodes
  * to the coarse buckets it overlaps
  * (`s DIV w … e DIV w` — (span/w)+1 rows), every point maps to its
  * ONE bucket, and the join becomes a plain equi-join on the bucket
  * plus a residual `BETWEEN` filter. Each qualifying (point,
  * interval) pair meets in exactly one bucket — the point's — so no
  * dedup pass is needed. Catalyst then picks broadcast/SMJ/shuffled-
  * hash by size, AQE re-plans at runtime, and a skewed bucket is
  * salvageable with the standard AQE skew-join handling — none of
  * which exists for a nested-loop plan.
  *
  * `bucketWidth` is the one dial: pick it near the TYPICAL interval
  * span (replication factor = span/w + 1; too-small w explodes
  * intervals, too-large w degrades the residual filter's
  * selectivity). Domain is non-negative epochs (long DIV truncation
  * = floor there); both frames' time columns must already be in the
  * same integer unit — go through `Tables.epochMicros` for
  * timestamps.
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val clash = points.columns.intersect(intervals.columns)
    require(clash.isEmpty,
      s"column collision between points and intervals: ${clash.mkString(",")}" +
        " — rename one side")
    val ivb = intervals
      .filter(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(startCol) <= col(endCol))
      .withColumn("_bkt", explode(sequence(
        expr(s"`$startCol` DIV $bucketWidth"),
        expr(s"`$endCol` DIV $bucketWidth"))))
    val ptb = points.filter(col(pointCol).isNotNull)
      .withColumn("_bkt", expr(s"`$pointCol` DIV $bucketWidth"))
    ptb.join(ivb, Seq("_bkt"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("_bkt")
  }
}
