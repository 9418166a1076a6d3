package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** D92: BM25 lexical top-k retrieval — the SPARSE sibling of D90's
  * dense batch retrieval ([[graft.ann.Ann.batchTopK]]) and the other
  * half of every production retrieval stack (hybrid search = dense
  * cosine + lexical BM25 fused; see the e2e-8 composite). Robertson &
  * Zaragoza 2009 (the Okapi BM25 probabilistic relevance framework),
  * idf in the Lucene `ln(1 + (N-df+0.5)/(df+0.5))` form so every
  * term's contribution is strictly positive. Not in the reference
  * (dataqtor has no retrieval); LLM-pipeline extension set, SURVEY
  * §2 D.
  *
  * Spark-first shape — the inverted-index factorization, corpus-linear
  * with the query side bounded by contract:
  *  - postings: ONE map-side-combined (doc, term) groupBy over the
  *    token explode — the only corpus-sized shuffle (the D60/Keywords
  *    tf frame, persisted: it feeds doc lengths AND scoring);
  *  - doc lengths dl and the (N, Σdl) stats both derive from that
  *    SAME frame (one doc-keyed rollup; stats ride as a broadcast
  *    one-row aggregate — no driver action, no second corpus scan);
  *  - the query vocabulary (distinct terms over ALL queries) is a
  *    BROADCAST dimension — postings are semi-joined to it FIRST, so
  *    df, the dl join, and scoring all run over query-vocab posting
  *    lists only, never the full corpus (the inverted-index access
  *    path a search engine takes, expressed relationally);
  *  - per-query top-k via [[graft.functions.TopKPairsAgg]] — the
  *    map-side-combining k-bounded aggregate, so the final shuffle
  *    carries ≤ partitions × queries × k pairs where a rank window
  *    would ship every scored (query, doc) pair (the D90 argument).
  *
  * Float discipline (repo-wide): each (query, term, doc) contribution
  * idf·tfn·1e6 is ONE double expression over exact-in-double integer
  * inputs (tf, df, dl, N, Σdl all < 2^53), quantized to MICRO units
  * with a boundary-distance guard (the D80/D60 scheme) BEFORE any
  * sum — per-(query, doc) scores are then LONG sums, exact and
  * merge-order-independent, and ranks follow the total order
  * (score_micro DESC, doc id ASC): bit-stable across partitionings
  * and engines. k1/b literals are IEEE-identical on any engine that
  * parses the same decimal text.
  *
  * Semantics at the edges (by contract): tokens are whitespace
  * tokens of `trim(text)` (the repo-wide tokenization); null/empty
  * docs have no postings and can never match; duplicate terms inside
  * a query count ONCE (classic BM25 over the query's term SET); a
  * query whose terms all miss the corpus yields no output rows; a
  * term present in every doc still contributes positively (Lucene
  * idf form).
  */
object Bm25 {

  /** Top-`k` BM25 matches per query:
    * (query_id, rank, doc_id, score_micro), rank 1..k under
    * (score_micro DESC, doc_id ASC). See object doc for the plan
    * shape and the micro-unit float discipline.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: DataFrame, queryIdCol: String, queryTextCol: String,
               k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25TopKAndGuard(docs, idCol, textCol, queries, queryIdCol,
      queryTextCol, k, k1, b)._1

  /** [[bm25TopK]] plus the ONE-ROW rounding-boundary guard
    * (`min_score_dist`): minimum distance of any (query, term, doc)
    * pre-round idf·tfn·1e6 double from its .5 boundary; `> 1e-7`
    * certifies the micro contributions are engine-portable (the
    * D80/D60/A21 scheme). 0.5 when nothing scored.
    */
  def bm25TopKAndGuard(docs: DataFrame, idCol: String, textCol: String,
                       queries: DataFrame, queryIdCol: String,
                       queryTextCol: String, k: Int,
                       k1: Double = 1.2, b: Double = 0.75)
      : (DataFrame, DataFrame) = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(k1 > 0 && b >= 0 && b <= 1, s"need k1 > 0, b in [0,1]: k1=$k1 b=$b")
    def toks(df: DataFrame, id: Column, text: Column, idName: String) = df
      .select(id.cast("long").as(idName),
        explode(split(trim(text), " +")).as("term"))
      .filter(length(col("term")) > 0)
    // the one corpus-sized shuffle; persisted — feeds dl AND scoring
    val post = graft.CacheScope.persist(
      toks(docs, col(idCol), col(textCol), "_did")
        .groupBy(col("_did"), col("term")).agg(count(lit(1)).as("tf")))
    val dl = post.groupBy(col("_did")).agg(sum(col("tf")).as("dl"))
    val stats = dl.agg(count(lit(1)).cast("double").as("_nd"),
      sum(col("dl")).cast("double").as("_sumdld"))
    // query terms: SET semantics per query; vocabulary broadcast
    val qt = toks(queries, col(queryIdCol), col(queryTextCol), "_qid").distinct()
    val vocab = qt.select(col("term")).distinct()
    // inverted-index access path: only query-vocab posting lists flow
    val fpost = graft.CacheScope.persist(
      post.join(broadcast(vocab), Seq("term")))
    val dft = fpost.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val tfD = col("tf").cast("double")
    val dfD = col("df").cast("double")
    val dlD = col("dl").cast("double")
    val idf = log(lit(1.0) +
      (col("_nd") - dfD + lit(0.5)) / (dfD + lit(0.5)))
    val tfn = tfD * (lit(k1) + lit(1.0)) /
      (tfD + lit(k1) * (lit(1.0) - lit(b) + lit(b) * dlD * col("_nd") / col("_sumdld")))
    val x = idf * tfn * lit(1e6)
    val terms = graft.CacheScope.persist(fpost
      .join(broadcast(dft), Seq("term"))
      .join(dl, Seq("_did"))
      .crossJoin(broadcast(stats))
      .join(broadcast(qt), Seq("term"))
      .select(col("_qid"), col("_did"),
        round(x).cast("long").as("_m"),
        abs(x - floor(x) - lit(0.5)).as("_bd")))
    val guard = terms.agg(
      coalesce(min(col("_bd")), lit(0.5)).as("min_score_dist"))
    val top = terms
      .groupBy(col("_qid"), col("_did"))
      .agg(sum(col("_m")).as("_sm"))
      .groupBy(col("_qid"))
      .agg(graft.functions.TopKPairsAgg(col("_sm"), col("_did"), k).as("_top"))
      .select(col("_qid").as("query_id"), posexplode(col("_top")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("doc_id"), col("col.score_micro").as("score_micro"))
    (top, guard)
  }
}
