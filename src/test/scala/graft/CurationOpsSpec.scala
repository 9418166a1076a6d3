package graft

import org.apache.spark.sql.functions._
import graft.text.{Classifier, TextAnalysis, TokenStats}
import graft.dedup.{Dedup, Sketch}

/** Specs for the r10 third-wave curation operators: CCNet perplexity
  * bucketing (D53), linear classifier inference (D54), soft dedup
  * weights (D55), KMV corpus-overlap sketch (D56), and the full
  * Gopher rule battery (D57).
  */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- D53 perplexity buckets ----

  test("perplexityBuckets cuts each group into exact integer tertiles, ties on id") {
    val scored = Seq(
      // en: 6 docs, scores 1..6 -> head(1,2) middle(3,4) tail(5,6)
      (1L, "en", 1.0), (2L, "en", 2.0), (3L, "en", 3.0),
      (4L, "en", 4.0), (5L, "en", 5.0), (6L, "en", 6.0),
      // de: 4 docs with a TIE on score 2.0 -> rank by id: 11,12,13,14
      // buckets by floor((r-1)*3/4): head, head, middle, tail
      (11L, "de", 2.0), (12L, "de", 2.0), (13L, "de", 3.0), (14L, "de", 9.0)
    ).toDF("doc_id", "lang", "cross_entropy")
    val got = TokenStats.perplexityBuckets(scored, "doc_id", "lang")
      .select("doc_id", "ppl_rank", "ppl_bucket")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got(1L) == ((1L, "head")) && got(2L) == ((2L, "head")))
    assert(got(3L) == ((3L, "middle")) && got(4L) == ((4L, "middle")))
    assert(got(5L) == ((5L, "tail")) && got(6L) == ((6L, "tail")))
    assert(got(11L) == ((1L, "head")) && got(12L) == ((2L, "head")))
    assert(got(13L) == ((3L, "middle")) && got(14L) == ((4L, "tail")))
  }

  test("perplexityBucketsApprox agrees with exact tiers on clean-gap groups") {
    val scored = (1 to 30).map(i => (i.toLong, "en", i.toDouble))
      .toDF("doc_id", "lang", "cross_entropy")
    val exact = TokenStats.perplexityBuckets(scored, "doc_id", "lang")
      .select("doc_id", "ppl_bucket").as[(Long, String)].collect().toMap
    val approx = TokenStats.perplexityBucketsApprox(scored, "doc_id", "lang")
      .select("doc_id", "ppl_bucket").as[(Long, String)].collect().toMap
    assert(exact == approx)
  }

  // ---- D54 linear classifier ----

  test("linearScore: uniform +1/-1-nat weights give sigmoid(±1); no weights give 0.5") {
    val docs = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    def run(w: org.apache.spark.sql.DataFrame) =
      Classifier.linearScore(docs, "text", "doc_id", w, buckets = 64)
        .select("feat_count", "dot_micro", "logit", "prob", "label")
        .collect().head
    val all = spark.range(64).select(col("id").as("bucket"))
    val pos = run(all.withColumn("w_micro", lit(1000000L)))
    // 3 unigrams + 2 bigrams = 5 features, each weighted 1 nat
    assert(pos.getLong(0) == 5L && pos.getLong(1) == 5000000L)
    assert(pos.getDouble(2) == 1.0 &&
      pos.getDouble(3) == math.rint(10000.0 / (1.0 + math.exp(-1.0))) / 10000.0 &&
      pos.getInt(4) == 1)
    val neg = run(all.withColumn("w_micro", lit(-1000000L)))
    assert(neg.getDouble(2) == -1.0 && neg.getInt(4) == 0)
    // sparse model: absent buckets weigh zero -> logit 0, prob 0.5
    val none = run(spark.emptyDataset[(Long, Long)].toDF("bucket", "w_micro"))
    assert(none.getLong(1) == 0L && none.getDouble(3) == 0.5 && none.getInt(4) == 1)
  }

  test("linearScore feature count is 2n-1 hashed unigrams+bigrams per n-token doc") {
    val docs = Seq((1L, "a b c d"), (2L, "solo"), (3L, "")).toDF("doc_id", "text")
    val w = Classifier.hashWeights(spark, 32, "s")
    val got = Classifier.linearScore(docs, "text", "doc_id", w, buckets = 32)
      .select("doc_id", "feat_count").as[(Long, Long)].collect().toMap
    assert(got(1L) == 7L && got(2L) == 1L) // 4+3, 1+0
    assert(!got.contains(3L)) // empty doc has no features
  }

  // ---- D55 soft dedup weights ----

  test("softDedupWeights down-weights duplicate classes to unit mass") {
    val docs = Seq(
      (1L, "w1 w2"), (2L, "w1 w2"), (3L, "w1 w2"), (4L, "only once here")
    ).toDF("doc_id", "text")
    val got = Dedup.softDedupWeights(docs, "text", "doc_id")
      .select("doc_id", "occ", "weight", "eff_tokens")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(got(1L) == ((3L, 0.3333, 0.6667))) // 2 tokens / 3 copies
    assert(got(2L) == got(1L) && got(3L) == got(1L))
    assert(got(4L) == ((1L, 1.0, 3.0)))
    // class mass: each content class contributes ~1 doc in expectation
    val mass = got.values.map(_._2).sum
    assert(math.abs(mass - 2.0) < 0.001) // 2 distinct contents
  }

  // ---- D56 KMV sketch ----

  test("corpusJaccardKmv is exact when k covers the union; estimator stays put under repartitioning") {
    val a = (1 to 6).map(i => (i.toLong, s"doc text $i")).toDF("doc_id", "text")
    val b = (4 to 9).map(i => (i.toLong, s"doc text $i")).toDF("doc_id", "text")
    val r = Sketch.corpusJaccardKmv(a, b, "text", k = 100, withExact = true).collect().head
    assert(r.getAs[Long]("k_used") == 9L)
    assert(r.getAs[Long]("inter_cnt") == 3L)
    assert(r.getAs[Double]("j_est") == 0.3333 && r.getAs[Double]("j_exact") == 0.3333)
    assert(r.getAs[Long]("union_est") == 9L && r.getAs[Long]("union_exact") == 9L)
    // truncated sketch: deterministic under any input partitioning
    val t1 = Sketch.corpusJaccardKmv(a.repartition(1), b.repartition(1), "text", k = 4)
      .collect().head
    val t7 = Sketch.corpusJaccardKmv(a.repartition(7), b.repartition(7), "text", k = 4)
      .collect().head
    assert(t1 == t7 && t1.getAs[Long]("k_used") == 4L)
    assert(t1.getAs[Double]("j_est") >= 0.0 && t1.getAs[Double]("j_est") <= 1.0)
    // normalization: formatting-only variants are one content class
    val av = Seq((1L, "Doc   Text 1"), (2L, "doc text 1")).toDF("doc_id", "text")
    val bv = Seq((3L, "doc  text 1")).toDF("doc_id", "text")
    val n = Sketch.corpusJaccardKmv(av, bv, "text", k = 10, withExact = true).collect().head
    assert(n.getAs[Long]("union_exact") == 1L && n.getAs[Double]("j_exact") == 1.0)
  }

  // ---- D59 cross-source duplication matrix ----

  test("sourceOverlapMatrix: containment per source pair, normalization folds variants") {
    val df = Seq(
      ("crawlA", "shared one"), ("crawlA", "shared two"), ("crawlA", "only a"),
      ("crawlB", "SHARED   one"), ("crawlB", "shared two"), // both shared w/ A (normalized)
      ("crawlB", "only b1"), ("crawlB", "only b2"),
      ("crawlC", "isolated")
    ).toDF("source", "text")
    val m = graft.dedup.Sketch.sourceOverlapMatrix(df, "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("shared"), r.getAs[Long]("total_a"),
          r.getAs[Long]("total_b"), r.getAs[Double]("overlap_frac")))).toMap
    // only the pair that shares content appears; C is absent
    assert(m.keySet == Set(("crawlA", "crawlB")))
    // containment = 2 shared / min(3, 4) distinct
    assert(m(("crawlA", "crawlB")) == ((2L, 3L, 4L, 0.6667)))
  }

  test("sourceOverlapMatrix: duplicate rows within a source do not inflate totals") {
    val df = Seq(
      ("a", "x"), ("a", "x"), ("a", "y"),
      ("b", "x"), ("b", "x")
    ).toDF("source", "text")
    val r = graft.dedup.Sketch.sourceOverlapMatrix(df, "text", "source")
      .collect().head
    assert((r.getAs[Long]("shared"), r.getAs[Long]("total_a"),
      r.getAs[Long]("total_b"), r.getAs[Double]("overlap_frac")) ==
      ((1L, 2L, 1L, 1.0)))
  }

  // ---- D57 Gopher rules ----

  test("gopherRules fires every rule class in cascade order") {
    val docs = Seq(
      (1L, "too short"),
      (2L, (1 to 60).map(i => s"word$i").mkString(" ")), // too many words
      (3L, (1 to 10).map(_ => "a b").mkString(" ")),      // mean word len 1 < 3
      (4L, (1 to 10).map(_ => "gooder words here").mkString(" ") + " ### ## #"),
      (5L, (1 to 10).map(i => s"- bullet line number $i").mkString("\n")),
      // both lines end '...' (frac 1.0 > 0.3) but the symbol ratio is
      // exactly 2/40 = 0.05, NOT above the 0.05 cap -> the ellipsis
      // rule, not the symbol rule, must claim this doc
      (6L, (1 to 2).map(l =>
        (1 to 19).map(i => s"common$i").mkString(" ") + " finale...").mkString("\n")),
      (7L, (1 to 12).map(i => s"12345 67890 $i").mkString(" ")),  // low alpha
      (8L, (1 to 12).map(i => s"zork$i blorp$i").mkString(" ")),  // no stopwords
      (9L, "the quick brown fox jumps over that lazy dog and " +
        "all of them have been with many other animals today here now then")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherRules(docs, "text", "doc_id",
      minWords = 5, maxWords = 50, minMeanWordLen = 3.0, maxMeanWordLen = 10.0,
      maxSymbolWordRatio = 0.05, maxBulletLineFrac = 0.5,
      maxEllipsisLineFrac = 0.3, minAlphaWordRatio = 0.8, minStopwords = 2)
      .select("doc_id", "reason").as[(Long, String)].collect().toMap
    assert(got(1L) == "too_few_words")
    assert(got(2L) == "too_many_words")
    assert(got(3L) == "word_len_out_of_range")
    assert(got(4L) == "too_many_symbols")
    assert(got(5L) == "too_many_bullets")
    assert(got(6L) == "too_many_ellipses")
    assert(got(7L) == "low_alpha")
    assert(got(8L) == "few_stopwords")
    assert(got(9L) == "keep")
  }

  test("gopherRules counts a 6+-dot line end once; empty docs fail too_few_words with null ratios") {
    val docs = Seq(
      (1L, "first line......\nsecond line"),
      (2L, "")).toDF("doc_id", "text")
    val rows = TextAnalysis.gopherRules(docs, "text", "doc_id")
      .select("doc_id", "n_words", "ellipsis_line_frac", "mean_word_len", "reason")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getDouble(2) == 0.5) // one of two lines, counted once
    assert(rows(2L).getLong(1) == 0L && rows(2L).isNullAt(3)
      && rows(2L).getString(4) == "too_few_words")
  }

  test("gopherRules is map-only (no Exchange in the physical plan)") {
    val docs = Seq((1L, "some text here")).toDF("doc_id", "text")
    val p = TextAnalysis.gopherRules(docs, "text", "doc_id")
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("Exchange"), s"expected shuffle-free plan:\n$p")
  }
}
