package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integer-exact damped PageRank (SURVEY §2 D75) — the web-graph
  * ranking step a crawl-curation pipeline uses to prioritize domains
  * (Page et al. 1999): rank mass flows along edges, damped at 15%.
  *
  * Engine- and partitioning-portable BY CONSTRUCTION: ranks live in
  * integer MICRO units and every operation is integer
  * (`(r·dampPct) DIV (100·outdeg)` per edge, integer sums, base
  * `((total·(100−damp)) DIV 100) DIV n`) — no float accumulation, so
  * the result is bit-identical across engines, shuffle orders, and
  * partition counts (the repo's micro-nat discipline applied to an
  * iterative algorithm). Deliberate simple-variant semantics,
  * documented: DIV remainders and dangling-node mass are dropped
  * (total mass decays slightly — rankings, not probabilities, are
  * the product), and iterations are FIXED (the D21 bounded-rounds
  * rule: convergence-driven loops are unbounded plans).
  *
  * Scale shape per iteration: one edges⋈ranks join (shuffle on src,
  * or broadcast when ranks fit), one map-side-combined groupBy dst,
  * one left join back to nodes — corpus-linear in |edges|. Each
  * iteration's ranks are persisted so iteration k+1 starts from a
  * materialized frame, not a k-deep recomputed lineage.
  */
object PageRank {

  def rankMicro(edges: DataFrame, srcCol: String, dstCol: String,
                iterations: Int = 3, totalMicro: Long = 1000000L,
                dampPct: Int = 85): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations out of [1,50]: $iterations (fixed-round plan; 50 is the loud valve)")
    require(dampPct > 0 && dampPct < 100, s"dampPct out of (0,100): $dampPct")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val nRow = nodes.agg(count(lit(1)).as("_n"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val base = expr(s"(($totalMicro * ${100 - dampPct}) DIV 100) DIV _n")
    var ranks = graft.CacheScope.persist(
      nodes.crossJoin(broadcast(nRow))
        .select(col("node"), expr(s"$totalMicro DIV _n").as("r")))
    (1 to iterations).foreach { _ =>
      val contribs = e
        .join(ranks.select(col("node").as("src"), col("r")), "src")
        .join(deg, "src")
        .select(col("dst").as("node"),
          expr(s"(r * $dampPct) DIV (100 * deg)").as("c"))
        .groupBy("node").agg(sum(col("c")).as("in"))
      ranks = graft.CacheScope.persist(
        nodes.crossJoin(broadcast(nRow))
          .join(contribs, Seq("node"), "left")
          .select(col("node"),
            (base + coalesce(col("in"), lit(0L))).as("r")))
    }
    ranks.select(col("node"), col("r").as("rank_micro"))
  }
}
