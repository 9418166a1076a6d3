package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level token statistics for training-data curation:
  * unigram language-model scoring (the classic perplexity-style
  * quality signal) and vocabulary induction with out-of-vocabulary
  * rates (tokenizer-coverage planning). Part of the LLM-pipeline
  * extension set, SURVEY §2 D.
  *
  * Tokenization is the repo-wide whitespace split (see
  * [[TextAnalysis.wordCount]]); all shuffles key on the token, with
  * map-side combine collapsing each partition's token multiset before
  * the exchange — corpus-linear, never pairwise.
  */
object TokenStats {

  private def tokens(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol), explode(split(trim(col(textCol)), " +")).as("token"))
      .filter(length(col("token")) > 0)

  /** (token, cnt) corpus unigram counts. */
  def unigramCounts(df: DataFrame, textCol: String, idCol: String): DataFrame =
    tokens(df, textCol, idCol).groupBy(col("token")).agg(count(lit(1)).as("cnt"))

  /** Per-document unigram cross-entropy (mean −ln p(token), nats):
    * the higher the score, the more surprising the document is under
    * the corpus unigram model — repetitive/template docs score low,
    * lexically odd docs score high. `lm` is (token, cnt) from
    * [[unigramCounts]] (score against the same corpus or a reference
    * corpus); unseen tokens get add-one smoothing mass 1/(total+1).
    *
    * Determinism at the float boundary: per-token −ln p is quantized
    * to MICRO-NATS (a long) and summed exactly — integer sums are
    * reduction-order-independent, so the result is bit-stable across
    * partitionings and engines, unlike a double sum whose low bits
    * depend on reduction order.
    */
  def crossEntropy(df: DataFrame, textCol: String, idCol: String,
                   lm: DataFrame): DataFrame = {
    // total token mass rides along as a broadcast scalar (one row) —
    // same pattern as StringSim's N; no driver-side count action
    val total = lm.agg(sum(col("cnt")).as("_total"))
    val toks = tokens(df, textCol, idCol)
    val scored = toks
      .join(lm.select(col("token"), col("cnt")), Seq("token"), "left")
      .crossJoin(broadcast(total))
      .select(col(idCol),
        (-log(coalesce(col("cnt"), lit(1L)).cast("double")
          / (col("_total") + 1L).cast("double"))).as("nll"))
    scored
      .select(col(idCol), round(col("nll") * 1e6).cast("long").as("nll_micro"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("token_count"),
        round((sum(col("nll_micro")) / count(lit(1))).cast("double") / 1e6, 4)
          .as("cross_entropy"))
  }

  /** (w1, w2, cnt) corpus bigram counts over adjacent whitespace
    * tokens. The bigram list is built scan-locally from the token
    * array (no window function — a per-doc window would shuffle the
    * corpus by doc just to see each token's neighbor, which the array
    * already provides); the only shuffle is the groupBy on the bigram
    * key with map-side combine. One-token documents contribute
    * nothing (they have no adjacent pair).
    */
  def bigramCounts(df: DataFrame, textCol: String, idCol: String): DataFrame =
    bigrams(df, textCol, idCol).groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("cnt"))

  // (id, w1, w2) adjacent-token pairs, scan-local (t[] is 0-based)
  private def bigrams(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), split(trim(col(textCol)), " +").as("t"))
      .filter(size(col("t")) >= 2)
      .select(col(idCol), explode(expr(
        "transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS w1, t[i] AS w2))"))
        .as("b"))
      .select(col(idCol), col("b.w1").as("w1"), col("b.w2").as("w2"))

  /** Per-document BIGRAM cross-entropy (mean −ln p(w2|w1), nats) —
    * the CCNet-style fluency signal one order above [[crossEntropy]]:
    * a unigram model cannot see scrambled word order or unnatural
    * collocations; a bigram model scores them as surprising. `lm` is
    * (w1, w2, cnt) from [[bigramCounts]] (self-scored or a reference
    * corpus); context totals derive from `lm` itself, so
    * p(w2|w1) = cnt(w1,w2) / Σ_w cnt(w1,w). Backoff for cross-corpus
    * scoring: a seen context with an unseen continuation gets
    * add-one mass 1/(ctx+1); an unseen context gets 1/(total+1) —
    * the same smoothing family as the unigram operator.
    *
    * Determinism: per-bigram −ln p quantizes to micro-nats and sums
    * as integers (reduction-order-independent), the same float
    * discipline as [[crossEntropy]]. Two shuffles total beyond the
    * LM build: the bigram join (keyed (w1,w2)) and the per-doc agg.
    */
  def bigramCrossEntropy(df: DataFrame, textCol: String, idCol: String,
                         lm: DataFrame): DataFrame = {
    val ctx = lm.groupBy(col("w1")).agg(sum(col("cnt")).as("ctx"))
    val total = lm.agg(sum(col("cnt")).as("_total"))
    val nll = when(col("cnt").isNotNull,
        -log(col("cnt").cast("double") / col("ctx").cast("double")))
      .when(col("ctx").isNotNull,
        -log(lit(1.0) / (col("ctx") + 1L).cast("double")))
      .otherwise(-log(lit(1.0) / (col("_total") + 1L).cast("double")))
    bigrams(df, textCol, idCol)
      .join(lm, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .crossJoin(broadcast(total))
      .select(col(idCol), round(nll * 1e6).cast("long").as("nll_micro"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("bigram_count"),
        round((sum(col("nll_micro")) / count(lit(1))).cast("double") / 1e6, 4)
          .as("cross_entropy"))
  }

  /** The `vocabSize` most frequent tokens (count desc, token asc —
    * total order, reproducible across runs and engines). The top-k
    * is a `TakeOrderedAndProject` (per-partition heads, no global
    * sort), same plan shape as the profiler's topK.
    */
  def topVocab(lm: DataFrame, vocabSize: Int): DataFrame =
    lm.orderBy(col("cnt").desc, col("token").asc).limit(vocabSize)

  /** CCNet-style perplexity bucketing (Wenzek et al., "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl
    * Data", LREC 2020): within each group (language), rank documents
    * by a fluency score ascending (lower cross-entropy = more fluent)
    * and cut the ranking into thirds — `head` (best), `middle`,
    * `tail` (worst) — the standard coarse quality tiers a curation
    * pipeline mixes from. `scored` carries (id, group, score), e.g.
    * [[crossEntropy]] joined with a language column.
    *
    * Bucket arithmetic is pure integers: with per-group rank r
    * (1-based, ties broken id ascending — a total order) and group
    * size n, the tier index is ⌊(r−1)·3/n⌋ — no float percentile
    * whose rounding could flip a boundary document. The window
    * partitions by GROUP (parallel across languages, no global
    * sort); a corpus dominated by one language concentrates that
    * group in one task, which is inherent to exact ranking — at
    * 100 TB use [[perplexityBucketsApprox]], which replaces the rank
    * with two per-group threshold scalars (one bounded groupBy +
    * broadcast join, scan-local assignment).
    */
  def perplexityBuckets(scored: DataFrame, idCol: String, groupCol: String,
                        scoreCol: String = "cross_entropy"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(scoreCol).asc, col(idCol).asc)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    scored
      .withColumn("ppl_rank", row_number().over(w).cast("long"))
      .withColumn("_n", count(lit(1)).over(wAll))
      .withColumn("ppl_bucket",
        element_at(array(lit("head"), lit("middle"), lit("tail")),
          (((col("ppl_rank") - 1) * 3) / col("_n")).cast("int") + 1))
      .drop("_n")
  }

  /** The 100 TB flavor of [[perplexityBuckets]]: per-group
    * approx_percentile(score, {1/3, 2/3}) thresholds (bounded GK
    * sketch per group, output ≤ one row per group) broadcast back,
    * assignment scan-local. Boundary documents may land one tier off
    * the exact ranking (GK ε), which is the standard trade; tiers are
    * deterministic for a fixed input partitioning but not an exact
    * rank contract — the exact flavor remains the oracle path.
    */
  def perplexityBucketsApprox(scored: DataFrame, idCol: String, groupCol: String,
                              scoreCol: String = "cross_entropy"): DataFrame = {
    val cuts = scored.groupBy(col(groupCol))
      .agg(percentile_approx(col(scoreCol),
        array(lit(1.0 / 3), lit(2.0 / 3)), lit(10000)).as("_c"))
      .select(col(groupCol), col("_c")(0).as("_c1"), col("_c")(1).as("_c2"))
    scored.join(broadcast(cuts), Seq(groupCol))
      .withColumn("ppl_bucket",
        when(col(scoreCol) <= col("_c1"), "head")
          .when(col(scoreCol) <= col("_c2"), "middle")
          .otherwise("tail"))
      .drop("_c1", "_c2")
  }

  /** Per-document out-of-vocabulary token share against `vocab`
    * ((token) or (token, cnt) frame, e.g. [[topVocab]]'s output):
    * (doc, token_count, oov_count, oov_rate). The vocabulary is
    * bounded (vocabSize rows) so membership is one broadcast join;
    * rates are ratios of exact integer counts.
    */
  def oovRate(df: DataFrame, textCol: String, idCol: String,
              vocab: DataFrame): DataFrame =
    tokens(df, textCol, idCol)
      .join(broadcast(vocab.select(col("token"), lit(1).as("_in_vocab"))),
        Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("token_count"),
        count(when(col("_in_vocab").isNull, 1)).as("oov_count"))
      .withColumn("oov_rate",
        round(col("oov_count") / col("token_count").cast("double"), 4))

  /** Jensen–Shannon divergence between two corpora's unigram token
    * distributions — the corpus-level "how different is crawl B from
    * corpus A" drift signal at the TOKEN level (the text counterpart
    * of [[graft.profile.Drift.psi]]'s categorical-column PSI), used to
    * vet a new dump before mixing it in, or to monitor distribution
    * shift between pipeline stages.
    *
    * Definition: with add-one smoothing over the JOINT vocabulary V
    * (so both distributions assign every observed token nonzero mass —
    * the [[graft.pipeline.Dsir]] smoothing), P_t = (a_t+1)/(A+V),
    * Q_t = (b_t+1)/(B+V), M = (P+Q)/2,
    * JS = ½·KL(P‖M) + ½·KL(Q‖M) ∈ [0, ln 2] nats. Symmetric and
    * bounded, unlike raw KL.
    *
    * Spark-first shape: one map-side-combined token groupBy per side
    * (bounded by each vocabulary), ONE full-outer join on the token
    * key, totals as broadcast one-row aggregates, one final aggregate —
    * corpus-linear, join bounded by vocab.
    *
    * Float discipline: each token's two KL terms p·ln(p/m), q·ln(q/m)
    * quantize to NANO-nats (long; terms are O(p) ≤ 1 so the corpus sum
    * stays far under long range) and sum exactly; display values
    * derive from the integer sums. ln() is the one libm call — the
    * returned guard (`min_term_dist`, one row) certifies every
    * pre-round term sat > 1e-7 nano from its rounding boundary, the
    * [[graft.pipeline.Dsir]] portability scheme.
    *
    * Output: tall (metric, value) — js_nats, kl_pm_nats, kl_qm_nats
    * (4 dp, integer-space rounding), vocab, total_a, total_b.
    */
  def jsDivergence(a: DataFrame, b: DataFrame, textCol: String,
                   idCol: String): DataFrame =
    jsDivergenceAndGuard(a, b, textCol, idCol)._1

  def jsDivergenceAndGuard(a: DataFrame, b: DataFrame, textCol: String,
                           idCol: String): (DataFrame, DataFrame) = {
    val ca = unigramCounts(a, textCol, idCol).withColumnRenamed("cnt", "_ac")
    val cb = unigramCounts(b, textCol, idCol).withColumnRenamed("cnt", "_bc")
    // persisted: the joined vocab frame feeds the totals aggregate AND
    // the term computation — without the pin both corpora tokenize
    // twice (vocab-bounded cache, corpus-sized saving)
    val joined = graft.CacheScope.persist(ca.join(cb, Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("_ac"), lit(0L)).as("_ac"),
        coalesce(col("_bc"), lit(0L)).as("_bc")))
    val totals = joined.agg(sum(col("_ac")).as("_ta"), sum(col("_bc")).as("_tb"),
      count(lit(1)).as("_v"))
    val p = (col("_ac") + 1L).cast("double") / (col("_ta") + col("_v")).cast("double")
    val q = (col("_bc") + 1L).cast("double") / (col("_tb") + col("_v")).cast("double")
    val m = (p + q) / 2.0
    val termP = p * log(p / m) * 1e9
    val termQ = q * log(q / m) * 1e9
    val terms = graft.CacheScope.persist(
      joined.crossJoin(broadcast(totals)).select(
        round(termP).cast("long").as("_tp"),
        round(termQ).cast("long").as("_tq"),
        least(abs(termP - floor(termP) - lit(0.5)),
          abs(termQ - floor(termQ) - lit(0.5))).as("_bd"),
        col("_ta"), col("_tb"), col("_v")))
    val guard = terms.agg(
      coalesce(min(col("_bd")), lit(0.5)).as("min_term_dist"))
    val agg = terms.agg(
      coalesce(sum(col("_tp")), lit(0L)).as("_kp"),
      coalesce(sum(col("_tq")), lit(0L)).as("_kq"),
      max(col("_v")).as("_v"), max(col("_ta")).as("_ta"), max(col("_tb")).as("_tb"))
    // 4-dp displays from the integer nano sums: /1e5 quotient ties sit
    // on exactly-representable .5 (the repo-wide tie-safe rounding);
    // js doubles the halving into the integer sum _kp+_kq (= 2·js)
    val out = agg.select(explode(map(
      lit("js_nats"),
      round((col("_kp") + col("_kq")).cast("double") / 200000.0).cast("long") / 10000.0,
      lit("kl_pm_nats"), round(col("_kp") / 100000.0).cast("long") / 10000.0,
      lit("kl_qm_nats"), round(col("_kq") / 100000.0).cast("long") / 10000.0,
      lit("vocab"), coalesce(col("_v"), lit(0L)).cast("double"),
      lit("total_a"), coalesce(col("_ta"), lit(0L)).cast("double"),
      lit("total_b"), coalesce(col("_tb"), lit(0L)).cast("double")))
      .as(Seq("metric", "value")))
    (out, guard)
  }

  /** PMI collocation mining (SURVEY §2 D80 — which adjacent token
    * pairs co-occur far beyond chance: multiword expressions, named
    * entities, domain phrases; Church & Hanks 1990):
    * PMI(x,y) = ln(N·c_xy / (c_x·c_y)) over the bigram frame, with
    * margins and N derived from that SAME (persisted) frame — one
    * corpus-sized pair groupBy, two vocabulary-bounded margin
    * rollups, no second corpus scan. Low-count pairs are noise
    * magnets (PMI favors rarity), hence `minCount`.
    *
    * Float discipline: all count products are exact in doubles
    * (< 2^53), so the single ln sees bit-identical inputs on any
    * engine; PMI quantizes to MICRO-nats with a boundary-distance
    * guard (the D60/D61/A21 scheme). Top-k is a TakeOrdered over the
    * total order (pmi desc, w1, w2).
    */
  def pmiCollocations(df: DataFrame, textCol: String, idCol: String,
                      minCount: Long = 5, k: Int = 20): DataFrame =
    pmiCollocationsAndGuard(df, textCol, idCol, minCount, k)._1

  def pmiCollocationsAndGuard(df: DataFrame, textCol: String, idCol: String,
                              minCount: Long = 5, k: Int = 20)
      : (DataFrame, DataFrame) = {
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    require(k >= 1, s"k must be >= 1: $k")
    val pairs = graft.CacheScope.persist(bigramCounts(df, textCol, idCol))
    val left = pairs.groupBy(col("w1")).agg(sum(col("cnt")).as("cx"))
    val right = pairs.groupBy(col("w2")).agg(sum(col("cnt")).as("cy"))
    val n = pairs.agg(sum(col("cnt")).as("_n"))
    val pmiDbl = log(col("_n").cast("double") * col("cnt") /
      (col("cx").cast("double") * col("cy"))) * 1e6
    val scored = graft.CacheScope.persist(
      pairs.filter(col("cnt") >= minCount)
        .join(left, "w1").join(right, "w2")
        .crossJoin(broadcast(n))
        .select(col("w1"), col("w2"), col("cnt"),
          round(pmiDbl).cast("long").as("pmi_micro"),
          abs(pmiDbl - floor(pmiDbl) - lit(0.5)).as("_bd")))
    val guard = scored.agg(
      coalesce(min(col("_bd")), lit(0.5)).as("min_pmi_dist"))
    val top = scored.drop("_bd")
      .orderBy(col("pmi_micro").desc, col("w1").asc, col("w2").asc)
      .limit(k)
    (top, guard)
  }
}
