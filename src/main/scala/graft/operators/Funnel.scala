package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** First-touch funnel analysis (SURVEY §2 D79) — the classic event-
  * analytics question: of the users who did step 1, how many went on
  * to step 2, then step 3, IN ORDER? A user reaches step i when their
  * FIRST qualifying step-i event is strictly after their first
  * qualifying step-(i−1) event (first-touch semantics — later
  * re-entries don't resurrect a funnel; deterministic and
  * oracle-checkable, unlike "any matching subsequence" variants).
  *
  * Scale shape: per step, one filtered map-side-combined
  * groupBy(user) min(ts) plus one user-keyed join against the
  * previous frontier — the frontier only SHRINKS down the funnel, and
  * AQE broadcasts it once it fits. Each frontier is persisted (it
  * feeds both its count row and the next join — the shared-frame
  * rule). The report is a union of one-row aggregates: no driver
  * collect, one job.
  */
object Funnel {

  def firstTouch(events: DataFrame, userCol: String, tsCol: String,
                 typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "firstTouch: need >= 1 step")
    require(steps.distinct.size == steps.size, "firstTouch: duplicate steps")
    val base = events.filter(col(userCol).isNotNull && col(tsCol).isNotNull)
    var frontier = graft.CacheScope.persist(
      base.filter(col(typeCol) === steps.head)
        .groupBy(col(userCol).as("_u")).agg(min(col(tsCol)).as("_t")))
    val reports = scala.collection.mutable.ListBuffer(
      frontier.agg(count(lit(1)).as("users"))
        .select(lit(0).as("step_index"), lit(steps.head).as("step"),
          col("users")))
    steps.tail.zipWithIndex.foreach { case (s, i) =>
      frontier = graft.CacheScope.persist(
        base.filter(col(typeCol) === s)
          .join(frontier, col(userCol) === col("_u") && col(tsCol) > col("_t"))
          .groupBy(col(userCol).as("_u_next")).agg(min(col(tsCol)).as("_t_next"))
          .withColumnRenamed("_u_next", "_u").withColumnRenamed("_t_next", "_t"))
      reports += frontier.agg(count(lit(1)).as("users"))
        .select(lit(i + 1).as("step_index"), lit(s).as("step"), col("users"))
    }
    val all = reports.reduce(_ unionByName _)
    val first = all.filter(col("step_index") === 0)
      .select(col("users").as("_first"))
    all.crossJoin(broadcast(first))
      .select(col("step_index"), col("step"), col("users"),
        (expr("(2*users*10000 + greatest(_first, 1L))" +
          " DIV (2*greatest(_first, 1L))") / 100.0).as("conversion_pct"))
      .orderBy("step_index")
  }
}
