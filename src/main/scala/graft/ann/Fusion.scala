package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid-retrieval rank fusion — the step that combines D90's dense
  * (embedding cosine) and D92's sparse (BM25) ranked lists into one
  * result list, the standard production retrieval stack (dense
  * recalls paraphrase, sparse recalls exact terms; fusing beats
  * either alone). Reciprocal Rank Fusion, Cormack/Clarke/Büttcher
  * SIGIR 2009: score(d) = Σ_systems 1/(K + rank_sys(d)) — rank-only,
  * so it needs no score calibration between systems. Not in the
  * reference; LLM-pipeline extension set, SURVEY §2.
  *
  * Exactness: contributions are computed in integer MICRO units via
  * LONG division — 1000000 div (K + rank) — and summed as longs, so
  * fusion is bit-exact on any engine with NO float boundary to guard
  * (the one arithmetic novelty vs the micro-quantize-then-guard
  * family: integer div needs no guard). Final ranks follow the total
  * order (rrf_micro DESC, doc_id ASC).
  *
  * Scale shape: inputs are retrieval OUTPUTS — already ≤ queries × k
  * rows per system — so fusion is a union + two bounded groupBys;
  * per-query top-k rides the map-side-combining
  * [[graft.functions.TopKPairsAgg]] (no Window, the D90 discipline).
  * Within a system a doc may appear under several ranks (e.g. two
  * dense hits bridging to one doc): the BEST (minimum) rank counts,
  * per the RRF contract over ranked doc lists.
  */
object Fusion {

  /** Fuse per-system ranked lists (columns: query_id, rank, doc_id —
    * rank 1-based best-first) into per-query top-`k`:
    * (query_id, rank, doc_id, rrf_micro). `rrfK` is RRF's smoothing
    * constant (60 in the original paper).
    */
  def rrfFuse(systems: Seq[DataFrame], k: Int, rrfK: Int = 60): DataFrame = {
    require(systems.nonEmpty, "rrfFuse: need at least one system")
    require(k >= 1, s"k must be >= 1, got $k")
    require(rrfK >= 0, s"rrfK must be >= 0, got $rrfK")
    val perSystem = systems.map { df =>
      df.select(col("query_id").cast("long"), col("rank").cast("long"),
          col("doc_id").cast("long"))
        .groupBy(col("query_id"), col("doc_id"))
        .agg(min(col("rank")).as("_r"))
        .select(col("query_id"), col("doc_id"),
          expr(s"1000000L div (${rrfK}L + _r)").as("_c"))
    }
    perSystem.reduce(_.unionByName(_))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("_c")).as("_s"))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKPairsAgg(col("_s"), col("doc_id"), k).as("_top"))
      .select(col("query_id"), posexplode(col("_top")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("doc_id"), col("col.score_micro").as("rrf_micro"))
  }
}
