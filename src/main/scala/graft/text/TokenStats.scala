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

  /** The `vocabSize` most frequent tokens (count desc, token asc —
    * total order, reproducible across runs and engines). The top-k
    * is a `TakeOrderedAndProject` (per-partition heads, no global
    * sort), same plan shape as the profiler's topK.
    */
  def topVocab(lm: DataFrame, vocabSize: Int): DataFrame =
    lm.orderBy(col("cnt").desc, col("token").asc).limit(vocabSize)

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
