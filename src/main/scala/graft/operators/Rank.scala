package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** D96: distributed global rank — a total-order position column
  * (0-based dense global rank, i.e. zipWithIndex over a sort order)
  * WITHOUT a single-task window. The missing scalable half of the
  * reference's index semantics (C1b `withRowIndex` guards its
  * unpartitioned `Window.orderBy` with a loud row cap — correct for
  * report-sized frames, a dead end for corpora) and the building
  * block for "assign stable dense ids", "take the global top
  * percentile by rank", and curriculum positions over a whole corpus.
  *
  * The classic two-pass range-partitioned rank:
  *  1. range-partition on the sort key + sort within partitions
  *     (Spark's parallel global sort — sampled boundaries, every
  *     partition sorts independently), PERSISTED with its partition
  *     id materialized: the sampled boundaries are nondeterministic
  *     run to run, so both downstream passes must see ONE frozen
  *     partitioning (the pin is correctness-load-bearing, not an
  *     optimization);
  *  2. per-partition counts (a P-row frame) → cumulative offsets via
  *     a window over that BOUNDED frame (single-partition by
  *     construction and P-sized — the A21/D53 bounded-frame
  *     discipline, not a corpus funnel);
  *  3. global_rank = partition offset + partition-local rank (a
  *     window PARTITIONED BY the materialized partition id —
  *     parallel across partitions).
  *
  * The OUTPUT is partitioning-independent even though the boundaries
  * are not: range partitioning preserves the global order across
  * partitions and the local sort finishes it, so offset + local rank
  * is THE total-order position for any boundary placement — but only
  * under a TOTAL order. `sortCols` + the id tie-break must order
  * every row uniquely; callers pass the id last (enforced by
  * appending `idCol` to the sort).
  */
object Rank {

  /** (input columns) + `global_rank` (0-based, dense, total-order
    * position under (sortCols, idCol)). `partitions` sizes the range
    * partitioning — at scale set it so partitions fit in executor
    * memory; the rank values do not depend on it.
    */
  def globalRank(df: DataFrame, sortCols: Seq[Column], idCol: Column,
                 partitions: Int = 0): DataFrame = {
    require(sortCols.nonEmpty, "globalRank: need at least one sort column")
    val order = sortCols :+ idCol.asc
    val ranged =
      if (partitions > 0) df.repartitionByRange(partitions, order: _*)
      else df.repartitionByRange(order: _*)
    // freeze the sampled boundaries: pid is computed ONCE and the
    // lineage is TRUNCATED (localCheckpoint, eager), so a recompute —
    // cache eviction, executor loss — can never re-sample boundaries
    // and silently reassign pids between the counts pass and the rank
    // pass: downstream either reads the one frozen partitioning or
    // fails loudly on missing blocks (ADVICE r13: bare persist() only
    // made recompute unlikely, not impossible)
    val pinned = graft.CacheScope.track(
      ranged.withColumn("_pid", spark_partition_id()).localCheckpoint(true))
    val counts = pinned.groupBy(col("_pid")).agg(count(lit(1)).as("_n"))
    // offsets over the P-row counts frame: bounded by construction
    val offsets = counts.withColumn("_off",
      coalesce(sum(col("_n")).over(
        Window.orderBy(col("_pid")).rowsBetween(
          Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_pid"), col("_off"))
    val local = Window.partitionBy(col("_pid")).orderBy(order: _*)
    pinned
      .withColumn("_lr", row_number().over(local).cast("long") - 1)
      .join(broadcast(offsets), Seq("_pid"))
      .withColumn("global_rank", col("_off") + col("_lr"))
      .drop("_pid", "_lr", "_off")
  }

  /** Dense stable ids: `globalRank` + 1 under (sortCols, idCol),
    * named `stable_id` — the deterministic replacement for
    * `monotonically_increasing_id` (whose values depend on physical
    * partitioning) when downstream systems need reproducible compact
    * ids.
    */
  def assignStableIds(df: DataFrame, sortCols: Seq[Column], idCol: Column,
                      partitions: Int = 0): DataFrame =
    globalRank(df, sortCols, idCol, partitions)
      .withColumn("stable_id", col("global_rank") + 1)
      .drop("global_rank")
}
