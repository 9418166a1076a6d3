package graft

import org.apache.spark.sql.functions._
import graft.text.{Boilerplate, TokenStats, TextAnalysis}
import graft.ann.Ann
import graft.pipeline.Pipeline

/** Specs for the r4 training-pipeline additions: boilerplate line
  * removal, unigram-LM scoring, vocabulary/OOV, cluster assignment,
  * epoch shuffle, sequence-length histogram.
  */
class TokenStatsSpec extends SparkSpec {
  import spark.implicits._

  test("stripBoilerplate drops cross-doc repeated lines, keeps order, keeps within-doc repeats") {
    val docs = Seq(
      (1L, "alpha one\nfooter line\nbeta two"),
      (2L, "gamma three\nfooter line"),
      (3L, "footer line\ndelta four"),
      // doc 4 repeats ITS OWN line 3 times: doc-frequency is 1, so it
      // must survive a df-threshold of 2
      (4L, "same line\nsame line\nsame line"),
      // doc 5 is pure boilerplate -> comes back empty, not dropped
      (5L, "footer line")).toDF("doc_id", "text")
    val got = Boilerplate.stripBoilerplate(docs, "text", "doc_id", minRepeatDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "alpha one\nbeta two") // order preserved around the strip
    assert(got(2L) == "gamma three")
    assert(got(3L) == "delta four")
    assert(got(4L) == "same line\nsame line\nsame line")
    assert(got(5L) == "")
    assert(got.size == 5)
  }

  test("lineDocFreq counts DISTINCT documents per line") {
    val docs = Seq((1L, "a\na\na"), (2L, "a\nb")).toDF("doc_id", "text")
    val df = Boilerplate.lineDocFreq(docs, "text", "doc_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(df == Map("a" -> 2L, "b" -> 1L))
  }

  test("crossEntropy: hand-computed on a two-token corpus; smoothing for unseen tokens") {
    // corpus: "x x x y" -> counts x=3, y=1, total=4
    val corpus = Seq((1L, "x x x y")).toDF("doc_id", "text")
    val lm = TokenStats.unigramCounts(corpus, "text", "doc_id")
    // doc "x y": mean of -ln(3/5), -ln(1/5) at micro-nat quantization
    // (total+1 = 5 is the smoothing denominator everywhere)
    val seen = TokenStats.crossEntropy(Seq((7L, "x y")).toDF("doc_id", "text"),
      "text", "doc_id", lm).collect()(0)
    val expSeen = BigDecimal((math.round(-math.log(3.0 / 5) * 1e6)
      + math.round(-math.log(1.0 / 5) * 1e6)) / 2.0 / 1e6)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(seen.getLong(1) == 2L)
    assert(seen.getDouble(2) == expSeen)
    // unseen token z gets mass 1/(total+1) = 1/5
    val unseen = TokenStats.crossEntropy(Seq((8L, "z")).toDF("doc_id", "text"),
      "text", "doc_id", lm).collect()(0)
    val expUnseen = BigDecimal(math.round(-math.log(1.0 / 5) * 1e6) / 1e6)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(unseen.getDouble(2) == expUnseen)
  }

  test("bigramCrossEntropy: hand-computed conditionals; context and total backoff tiers") {
    // corpus: "a b a b a c" -> bigrams (a,b)x2 (b,a)x2 (a,c)x1
    // contexts: a·=3, b·=2; total bigrams = 5
    val corpus = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val lm = TokenStats.bigramCounts(corpus, "text", "doc_id")
    val cnts = lm.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(cnts == Map(("a", "b") -> 2L, ("b", "a") -> 2L, ("a", "c") -> 1L))
    def micro(p: Double) = math.round(-math.log(p) * 1e6)
    def exp4(micros: Seq[Long]) =
      BigDecimal(micros.sum / micros.size.toDouble / 1e6)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc "a b a": bigrams (a,b) p=2/3 and (b,a) p=2/2
    val seen = TokenStats.bigramCrossEntropy(
      Seq((7L, "a b a")).toDF("doc_id", "text"), "text", "doc_id", lm).collect()(0)
    assert(seen.getLong(1) == 2L)
    assert(seen.getDouble(2) == exp4(Seq(micro(2.0 / 3), micro(1.0))))
    // doc "a a": context 'a' seen (ctx=3) but pair unseen -> 1/(3+1);
    // doc "z z": context unseen -> 1/(total+1) = 1/6
    val ctxBack = TokenStats.bigramCrossEntropy(
      Seq((8L, "a a")).toDF("doc_id", "text"), "text", "doc_id", lm).collect()(0)
    assert(ctxBack.getDouble(2) == exp4(Seq(micro(1.0 / 4))))
    val totBack = TokenStats.bigramCrossEntropy(
      Seq((9L, "z z")).toDF("doc_id", "text"), "text", "doc_id", lm).collect()(0)
    assert(totBack.getDouble(2) == exp4(Seq(micro(1.0 / 6))))
    // one-token docs contribute no bigrams at all
    assert(TokenStats.bigramCrossEntropy(
      Seq((10L, "solo")).toDF("doc_id", "text"), "text", "doc_id", lm).count() == 0L)
  }

  test("topVocab breaks count ties by token ascending; oovRate counts misses") {
    val corpus = Seq((1L, "b b a a c")).toDF("doc_id", "text")
    val lm = TokenStats.unigramCounts(corpus, "text", "doc_id")
    // counts: a=2, b=2, c=1; V=1 must pick 'a' (tie a/b -> token asc)
    val v1 = TokenStats.topVocab(lm, 1).collect().map(_.getString(0)).toSeq
    assert(v1 == Seq("a"))
    val rates = TokenStats.oovRate(corpus, "text", "doc_id", TokenStats.topVocab(lm, 2))
      .collect()(0)
    // vocab {a, b}: 5 tokens, 1 OOV ('c')
    assert(rates.getLong(1) == 5L && rates.getLong(2) == 1L)
    assert(rates.getDouble(3) == 0.2)
  }

  test("assignClusters: max-cosine wins; later centroid wins exact ties") {
    val e1 = (1L, Array(1.0f, 0.0f, 0.0f))
    val e2 = (2L, Array(0.0f, 1.0f, 0.0f))
    val e3 = (3L, Array(0.9f, 0.1f, 0.0f))
    val emb = Seq(e1, e2, e3).toDF("vec_id", "embedding")
    val cents = Array(Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0))
    val got = Ann.assignClusters(emb, "embedding", "vec_id", cents)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 0))
    // identical centroids: every vector ties -> later index wins
    val tie = Ann.assignClusters(emb, "embedding", "vec_id",
      Array(Array(1.0, 0.0, 0.0), Array(1.0, 0.0, 0.0)))
      .collect().map(_.getInt(1)).toSet
    assert(tie == Set(1))
  }

  test("epochShuffle: reproducible per seed, different permutation across seeds") {
    val df = (1L to 50L).toDF("id")
    def order(seed: String): Seq[Long] =
      Pipeline.epochShuffle(df, col("id"), seed).collect().map(_.getLong(0)).toSeq
    assert(order("e1") == order("e1"))
    assert(order("e1") != order("e2"))
    assert(order("e1").sorted == (1L to 50L))
  }

  test("seqLenHistogram: integer bucket bounds cover 0 and powers of two") {
    val docs = Seq("", "w", "a b", "a b c",
      (1 to 15).map(_ => "t").mkString(" "),
      (1 to 16).map(_ => "t").mkString(" ")).toDF("text")
    val h = TextAnalysis.seqLenHistogram(docs, "text")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(h.toSeq == Seq(
      (0, 0L, 0L, 1L, 0L),    // empty doc
      (1, 1L, 1L, 1L, 1L),    // 1 token
      (2, 2L, 3L, 2L, 5L),    // 2- and 3-token docs
      (4, 8L, 15L, 1L, 15L),  // 15 tokens
      (5, 16L, 31L, 1L, 16L)))
  }

  test("semanticPairs finds in-cluster dups; semanticDedup keeps the min id") {
    // two well-separated clusters on axes; 4L is a re-ingested copy
    // of 1L (same cluster, cosine 1.0); 5L is a copy of 3L
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.99f, 0.14f)),
      (3L, Array(0.0f, 1.0f)),
      (4L, Array(1.0f, 0.0f)), (5L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val pairs = Ann.semanticPairs(emb, "embedding", "vec_id", cents, 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 4L), (3L, 5L)))
    val kept = Ann.semanticDedup(emb, "embedding", "vec_id", cents, 0.999)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 3L))
  }

  test("dedupNearAgainstStore drops near-dup batch rows; capped path stays exact") {
    val store = Seq((10L, "alpha beta gamma delta"), (11L, "x y z w")).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "alpha beta gamma delta"),      // exact dup of 10 -> dropped
      (2L, "alpha beta gamma epsilon"),    // jaccard 3/5 = 0.6 < 0.7 -> kept
      (3L, "x y z w q")).toDF("doc_id", "text") // 4/5 = 0.8 -> dropped
    // maxDocs = 0 forces the inverted-index plans; the default takes
    // the ≤64-word bitmap plan — all three must agree
    def run(cap: Long, maxDocs: Long) =
      graft.dedup.Dedup.dedupNearAgainstStore(batch, store, "text", "doc_id", 0.7,
        dfCap = cap, relDfCap = Double.NaN, allPairsMaxDocs = maxDocs)
        .collect().map(_.getLong(0)).toSet
    assert(run(Long.MaxValue, 0L) == Set(2L)) // uncapped inverted index
    // df-cap of 1 store doc per token: every token here is in exactly
    // one store doc, so candidates and scores are unchanged
    assert(run(1L, 0L) == Set(2L))            // capped inverted index
    assert(run(Long.MaxValue, 10000L) == Set(2L)) // bitmap popcount plan
    val m = graft.dedup.Dedup.nearDupMatches(batch, store, "text", "doc_id", 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(m == Set((1L, 10L, 1.0), (3L, 11L, 0.8)))
  }

  test("qualityFilterReport: first failing reason in cascade order; empty doc is too_short") {
    val docs = Seq(
      (1L, ""),                                        // too_short (0 tokens)
      (2L, (1 to 19).map(i => s"w$i").mkString(" ")),  // 19 tokens -> too_short
      (3L, (1 to 91).map(i => s"w$i").mkString(" ")),  // 91 -> too_long
      // 20 tokens, 5 of them "spam": top frac 0.25 > 0.15 -> repetitive
      (4L, ((1 to 15).map(i => s"u$i") ++ Seq.fill(5)("spam")).mkString(" ")),
      // 40 tokens from a 10-word vocab: distinct 0.25 < 0.40; top frac
      // 4/40 = 0.1 passes -> low_diversity
      (5L, (1 to 40).map(i => s"v${i % 10}").mkString(" ")),
      (6L, (1 to 30).map(i => s"k$i").mkString(" ")))  // keep
      .toDF("doc_id", "text")
    val got = graft.text.TextAnalysis.qualityFilterReport(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(got == Map(1L -> "too_short", 2L -> "too_short", 3L -> "too_long",
      4L -> "repetitive", 5L -> "low_diversity", 6L -> "keep"))
    val kept = graft.text.TextAnalysis.qualityFilter(docs, "text", "doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(6L))
  }

  test("PSI drift: zero for identical distributions, eps path for new categories, hand-checked value") {
    val before = Seq("a", "a", "b", "b").toDF("c")
    // identical distribution -> every term is ln(1)*0 = 0
    val same = graft.profile.Drift.categoricalPsi(before, before, Seq("c"))
      .collect()(0)
    assert(same.getDouble(2) == 0.0)
    // after: a=3/4, b=0 (missing -> eps), c=1/4 (new -> before eps)
    val after = Seq("a", "a", "a", "c").toDF("c")
    val exp = {
      def term(p: Double, q: Double) = math.round((p - q) * math.log(p / q) * 1e9)
      val eps = 1e-6
      BigDecimal((term(0.5, 0.75) + term(0.5, eps) + term(eps, 0.25)) / 1e9)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = graft.profile.Drift.categoricalPsi(before, after, Seq("c")).collect()(0)
    assert(got.getLong(1) == 3L, "categories = union of both sides")
    assert(got.getDouble(2) == exp, s"psi ${got.getDouble(2)} != $exp")
    // valueShifts reports signed share deltas over the union
    val shifts = graft.profile.Drift.valueShifts(before, after, Seq("c"))
      .collect().map(r => r.getString(1) -> r.getDouble(4)).toMap
    assert(shifts == Map("a" -> 0.25, "b" -> -0.5, "c" -> 0.25))
  }

  test("PSI null handling: nulls are a first-class '<null>' category") {
    val before = Seq(Some("x"), None, None).toDF("c")
    val after = Seq(Some("x"), Some("x"), None).toDF("c")
    val shifts = graft.profile.Drift.valueShifts(before, after, Seq("c"))
      .collect().map(r => r.getString(1) -> r.getDouble(4)).toMap
    assert(math.abs(shifts("<null>") - (1.0 / 3 - 2.0 / 3)) < 1e-6)
  }

  test("corpusDatasheet: engineered dup/empty/lang mix, hand-checked") {
    val docs = Seq(
      (1L, "a b c", "en"), (2L, "a b c", "en"),  // exact dup pair
      (3L, "d e", "de"), (4L, "", "en"),          // empty doc
      (5L, "f g h i", null)                       // null lang bucket
    ).toDF("doc_id", "text", "lang")
    val m = graft.text.TextAnalysis.corpusDatasheet(docs, "text", "doc_id", "lang")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("n_docs") == 5.0)
    assert(m("n_tokens") == 12.0)
    assert(m("exact_dup_rate") == 0.2)   // 5 docs, 4 distinct texts
    assert(m("empty_rate") == 0.2)
    assert(m("n_langs") == 3.0)          // en, de, <null>
    assert(m("top_lang_share") == 0.6)   // en = 3/5
    assert(m("avg_tokens") == 2.4)
  }

  test("keepFirstLineOccurrence: globally smallest (doc,pos) wins; within-doc repeats collapse") {
    val docs = Seq(
      (1L, "quote\nunique1"),
      (2L, "unique2\nquote"),       // 'quote' already seen at (1,0)
      (3L, "rep\nmid\nrep")         // within-doc repeat: (3,2) loses to (3,0)
    ).toDF("doc_id", "text")
    val out = Boilerplate.keepFirstLineOccurrence(docs, "text", "doc_id")
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "quote\nunique1", 2L -> "unique2", 3L -> "rep\nmid"))
  }

  test("keepFirstLineOccurrence: short lines are exempt; emptied docs come back empty") {
    val docs = Seq(
      (1L, "a\n\nb"),
      (2L, "c\n\nb"),               // blank line kept in BOTH; 'b' deduped
      (3L, "a")                     // whole doc is a dup of (1,0)
    ).toDF("doc_id", "text")
    val out = Boilerplate.keepFirstLineOccurrence(docs, "text", "doc_id")
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a\n\nb", 2L -> "c\n", 3L -> ""))
    // minLineLen exempts one-char lines from dedup entirely
    val out2 = Boilerplate.keepFirstLineOccurrence(docs, "text", "doc_id",
      minLineLen = 2).orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out2 == Map(1L -> "a\n\nb", 2L -> "c\n\nb", 3L -> "a"))
  }

  test("keepFirstLineOccurrence is partitioning-invariant") {
    val docs = (1L to 40L).map(i => (i, s"shared line\nown $i")).toDF("doc_id", "text")
    val a = Boilerplate.keepFirstLineOccurrence(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Boilerplate.keepFirstLineOccurrence(docs.repartition(11), "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b && a(1L) == "shared line\nown 1" && a(2L) == "own 2")
  }
}
