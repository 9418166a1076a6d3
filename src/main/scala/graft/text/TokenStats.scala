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
}
