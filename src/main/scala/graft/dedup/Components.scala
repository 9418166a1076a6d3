package graft.dedup

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate PAIR list — the step
  * that turns `minhashPairs`/`simhashPairs`/`cosinePairs` output into
  * an actionable dedup decision: every document in a component is a
  * mutual (transitive) near-duplicate, the smallest id is the
  * canonical survivor.
  *
  * Algorithm: min-label propagation with POINTER JUMPING. Each round
  * (a) lowers every node's label to the minimum over its neighbors'
  * labels (one shuffle keyed by node), then (b) jumps `lbl ←
  * label(lbl)` (one shuffle keyed by label), which halves chain depth
  * — so convergence is O(log diameter) rounds, not O(diameter): a
  * 1M-node path needs ~20 rounds, not 1M. Per-round state is one
  * (node, label) frame of 16 bytes/node; the previous round is
  * unpersisted as soon as the next materializes, so peak footprint is
  * two label frames regardless of round count. The driver sees only
  * the one-row convergence probe per round — labels never collect.
  */
object Components {

  /** (node, component) for every node appearing in `pairs`;
    * `component` = the smallest node id reachable via pair edges.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIters: Int = 30): DataFrame = {
    val e0 = pairs.select(col(aCol).cast("long").as("src"),
      col(bCol).cast("long").as("dst"))
    // symmetric edge list, deduped once and pinned for the loop
    val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().persist()
    // Every round's frame is localCheckpoint'ed, not just cached:
    // round i's plan references round i-1 TWICE (the pointer jump is
    // a self-join), so without lineage truncation the logical plan
    // doubles per round — exponential planner memory that OOMs the
    // driver long before data size matters. Checkpointing pins the
    // computed rows and resets the plan to a leaf. (On a cluster with
    // lineage-reliability requirements, swap for reliable
    // `checkpoint()` against a checkpoint dir; the shape is the same.)
    // initial labels already fold in round one of propagation: a
    // node's label starts at min(self, direct neighbors) — computed
    // by the same aggregation that enumerates the node set, so the
    // first loop iteration starts from depth-1 labels for free
    var labels = edges.groupBy(col("src").as("n"))
      .agg(least(F.min(col("dst")), first(col("src"))).as("lbl"))
      .localCheckpoint(true)
    var iters = 0
    var done = false
    while (!done && iters < maxIters) {
      // (a) min over neighbor labels (left join: isolated-after-dedup
      // nodes keep their label)
      val nbrMin = edges
        .join(labels.select(col("n").as("dst"), col("lbl").as("nlbl")), "dst")
        .groupBy(col("src").as("n"))
        .agg(F.min(col("nlbl")).as("nbr"))
      val lowered = labels.join(nbrMin, Seq("n"), "left")
        .select(col("n"), least(col("lbl"), coalesce(col("nbr"), col("lbl"))).as("lbl"))
      // (b) pointer jump: follow the label's own label. LAZY
      // checkpoint: the convergence probe right below is the round's
      // only action — it materializes the checkpoint as a side
      // effect, so each round costs ONE Spark job, not two.
      val next = lowered
        .join(lowered.select(col("n").as("lbl"), col("lbl").as("jump")),
          Seq("lbl"), "left")
        .select(col("n"), coalesce(col("jump"), col("lbl")).as("lbl"))
        .localCheckpoint(false)
      val changed = next
        .join(labels.select(col("n"), col("lbl").as("old")), "n")
        .filter(col("lbl") =!= col("old"))
        .limit(1).count() // existence probe, not a full count
      labels = next // superseded checkpoints are GC'd by the ContextCleaner
      done = changed == 0
      iters += 1
    }
    edges.unpersist(false)
    labels.select(col("n").as("node"), col("lbl").as("component"))
  }

  /** Keep one document per near-duplicate component (the smallest id)
    * plus every document not mentioned in `pairs` — the "collapse
    * duplicates" end of a dedup pipeline. Anti-join on the loser set:
    * the full table never shuffles by anything but the join key.
    */
  def dedupByPairs(df: DataFrame, idCol: String, pairs: DataFrame,
                   aCol: String, bCol: String): DataFrame = {
    val losers = connectedComponents(pairs, aCol, bCol)
      .filter(col("node") =!= col("component"))
      .select(col("node"))
    df.join(losers, df(idCol) === losers("node"), "left_anti")
  }
}
