package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: language-ID heuristic,
  * quality scoring, token counting, fingerprinting. Everything is a
  * scan-local Column expression (regex + length arithmetic) — zero
  * shuffle, codegen'd, linear at any corpus size.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def wordCount(c: Column): Column =
    when(length(trim(c)) === 0, 0).otherwise(size(split(trim(c), " +")))

  /** BPE-ish token count: count of `\w+|[^\w\s]` matches (words +
    * standalone punctuation), the classic pre-tokenizer granule.
    */
  def tokenCount(c: Column): Column = {
    val collapsed = regexp_replace(regexp_replace(c, "[A-Za-z0-9_]+", "x"), "\\s+", "")
    // after collapsing each word to one char and dropping whitespace,
    // every remaining char is exactly one token
    length(collapsed)
  }

  /** Distinct-word ratio (repetition signal; 1.0 = no repetition). */
  def distinctWordRatio(c: Column): Column =
    round(size(array_distinct(split(trim(c), " +")))
      / wordCount(c).cast("double"), 4)

  private def ratio(num: Column, den: Column): Column =
    round(num / den.cast("double"), 4)

  /** Count of space-delimited tokens of `c` that are in `stop`,
    * evaluated as ONE codegen'd regex pass. Equivalent to
    * `size(filter(split(c, " +"), w => w.isin(stop)))` but that form
    * materializes the token array and runs an interpreted lambda per
    * row (Spark evaluates higher-order functions outside codegen) —
    * measurably slower per-row and allocation-heavy at corpus scale.
    * Boundaries: leading `^`/space consumed, trailing space matched
    * by lookahead so adjacent stopwords still count; `\z` (not `$`)
    * so a token holding a trailing newline is NOT a hit, exactly like
    * the split-on-spaces form.
    */
  private def stopwordHits(c: Column, stop: Seq[String]): Column =
    regexp_count(c, lit("(?:^|[ ])(?:" + stop.mkString("|") + ")(?=[ ]|\\z)"))

  /** Quality-score feature struct (length / punctuation / digit /
    * uppercase / stopword / repetition ratios). A downstream filter
    * picks thresholds; this computes the features in one projection.
    */
  def qualityFeatures(c: Column): Column = {
    val n = length(c).cast("double")
    val words = wordCount(c)
    val punct = n - length(regexp_replace(c, """[\p{Punct}]""", ""))
    val digits = n - length(regexp_replace(c, "[0-9]", ""))
    val uppers = n - length(regexp_replace(c, "[A-Z]", ""))
    val stops = stopwordHits(lower(c),
      Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that"))
    struct(
      n.cast("long").as("n_chars"),
      words.as("n_words"),
      ratio(length(regexp_replace(c, " ", "")), words).as("avg_word_len"),
      ratio(punct, n).as("punct_ratio"),
      ratio(digits, n).as("digit_ratio"),
      ratio(uppers, n).as("upper_ratio"),
      ratio(stops, words).as("stopword_ratio"),
      distinctWordRatio(c).as("distinct_word_ratio"))
  }

  /** Simple composite quality score in [0,1]: penalize extreme
    * repetition, punctuation soup, and missing stopwords.
    */
  def qualityScore(c: Column): Column = {
    val f = qualityFeatures(c)
    round(
      (when(f.getField("distinct_word_ratio") >= 0.3, 0.4).otherwise(0.0)
        + when(f.getField("punct_ratio") <= 0.2, 0.3).otherwise(0.0)
        + when(f.getField("stopword_ratio") >= 0.02, 0.2).otherwise(0.0)
        + when(f.getField("n_words") >= 5, 0.1).otherwise(0.0)), 2)
  }

  /** N-gram-free language-ID heuristic: score per language =
    * stopword hits + script hits; argmax wins, 'und' if no signal.
    * Deliberately simple and deterministic (same arithmetic is
    * SQL-expressible for the oracle).
    */
  def languageId(c: Column): Column = {
    def hits(stop: Seq[String]): Column = stopwordHits(lower(c), stop)
    val scores = Seq(
      "en" -> hits(Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "for")),
      "es" -> hits(Seq("el", "la", "de", "que", "y", "los", "las", "un", "una", "es")),
      "de" -> hits(Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "von")),
      "fr" -> hits(Seq("le", "la", "les", "et", "est", "une", "des", "du", "que", "pour")),
      "zh" -> (length(c) - length(regexp_replace(c, "[\\x{4e00}-\\x{9fff}]", ""))))
    val best = scores.map { case (lang, s) =>
      struct(s.as("score"), lit(lang).as("lang"))
    }
    val top = greatest(best.toIndexedSeq: _*)
    when(top.getField("score") > 0, top.getField("lang")).otherwise(lit("und"))
  }

  /** 64-bit content fingerprint of normalized text (lower, collapsed
    * whitespace): stable across formatting-only edits.
    */
  def fingerprint(c: Column): Column =
    xxhash64(regexp_replace(lower(trim(c)), "\\s+", " "))

  /** Hex MD5 fingerprint (128-bit, collision-safe for exact dedup). */
  def fingerprintMd5(c: Column): Column =
    md5(regexp_replace(lower(trim(c)), "\\s+", " "))

  def profile(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol), qualityFeatures(col(textCol)).as("f"),
        qualityScore(col(textCol)).as("quality_score"),
        languageId(col(textCol)).as("lang_pred"),
        fingerprintMd5(col(textCol)).as("fingerprint"))
      .select(col(idCol), col("f.*"), col("quality_score"), col("lang_pred"), col("fingerprint"))

  /** Repetition signals in the Gopher-filter family (fraction of
    * tokens claimed by the single most frequent token / 2-gram):
    * boilerplate, keyword-stuffed, and template-generated documents
    * score high and get filtered before LLM training. Shape: two
    * explode → groupBy pipelines (map-side combined, shuffled on
    * (doc, gram) then doc — linear in corpus tokens); the per-row
    * gram arrays never materialize to the driver. `top_2gram_frac`
    * is null for documents of fewer than two tokens.
    */
  def repetitionMetrics(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val words = split(trim(col(textCol)), " +")
    val toks = df.select(col(idCol).as("id"), explode(words).as("t"))
    val topWord = toks.groupBy("id", "t").agg(count(lit(1)).as("c"))
      .groupBy("id")
      .agg(sum(col("c")).as("token_count"), max(col("c")).as("m"))
      .select(col("id"), col("token_count"),
        round(col("m") / col("token_count"), 4).as("top_word_frac"))
    val gramArr = when(size(words) >= 2,
      transform(sequence(lit(1), size(words) - 1),
        i => concat(element_at(words, i), lit(" "), element_at(words, i + 1))))
      .otherwise(array().cast("array<string>"))
    val grams = df.select(col(idCol).as("id"), explode(gramArr).as("t"))
    val topGram = grams.groupBy("id", "t").agg(count(lit(1)).as("c"))
      .groupBy("id")
      .agg(sum(col("c")).as("n2"), max(col("c")).as("m2"))
      .select(col("id"), round(col("m2") / col("n2"), 4).as("top_2gram_frac"))
    topWord.join(topGram, Seq("id"), "left")
      .select(col("id").as(idCol), col("token_count"),
        col("top_word_frac"), col("top_2gram_frac"))
  }

  /** Composite corpus quality filter (FineWeb/Gopher-style): one
    * token pipeline yields per-doc token count, top-word share, and
    * distinct-token ratio; a fixed-order rule cascade assigns each
    * document its FIRST failing reason (`too_short`, `too_long`,
    * `repetitive`, `low_diversity`) or `keep`. All three signals
    * come from a single (doc, token) grouped frame — two map-side-
    * combined shuffles for the whole report, not one pipeline per
    * rule. Ratios are int-derived and rounded, so the report is
    * engine-exact.
    */
  def qualityFilterReport(df: DataFrame, textCol: String, idCol: String,
                          minTokens: Long = 20, maxTokens: Long = 90,
                          maxTopWordFrac: Double = 0.15,
                          minDistinctRatio: Double = 0.40): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
        explode(split(trim(col(textCol)), " +")).as("t"))
      .filter(length(col("t")) > 0)
    val m = toks.groupBy("id", "t").agg(count(lit(1)).as("c"))
      .groupBy("id")
      .agg(sum(col("c")).as("n_tokens"), max(col("c")).as("_m"),
        count(lit(1)).as("_d"))
      .select(col("id"), col("n_tokens"),
        round(col("_m") / col("n_tokens"), 4).as("top_word_frac"),
        round(col("_d") / col("n_tokens"), 4).as("distinct_ratio"))
    // empty docs have no token rows — restore them (they fail
    // too_short by definition)
    df.select(col(idCol).as("id")).join(m, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("top_word_frac"), col("distinct_ratio"))
      .withColumn("reason",
        when(col("n_tokens") < minTokens, "too_short")
          .when(col("n_tokens") > maxTokens, "too_long")
          .when(col("top_word_frac") > maxTopWordFrac, "repetitive")
          .when(col("distinct_ratio") < minDistinctRatio, "low_diversity")
          .otherwise("keep"))
  }

  /** The surviving rows of [[qualityFilterReport]] (reason = keep),
    * original columns intact.
    */
  def qualityFilter(df: DataFrame, textCol: String, idCol: String,
                    minTokens: Long = 20, maxTokens: Long = 90,
                    maxTopWordFrac: Double = 0.15,
                    minDistinctRatio: Double = 0.40): DataFrame = {
    val kept = qualityFilterReport(df, textCol, idCol, minTokens, maxTokens,
      maxTopWordFrac, minDistinctRatio)
      .filter(col("reason") === "keep").select(col(idCol))
    df.join(kept, Seq(idCol), "left_semi")
  }

  /** Full Gopher rule battery (Rae et al. 2021, "Scaling Language
    * Models: ...Gopher", Table A1) — the line/char-level document
    * filters BEYOND [[qualityFilterReport]]'s token statistics:
    * word-count bounds, mean word length bounds, symbol-to-word
    * ratio (# and ellipsis), bullet-line and ellipsis-line
    * fractions, alphabetic-word ratio, and distinct-stopword
    * presence. Every signal is a scan-local Column expression
    * (regexp counts + length arithmetic over the whitespace-
    * normalized text) — ZERO shuffle, map-only, linear at any corpus
    * size; ratios round 4-dp in integer space (the repo rounding
    * policy). Output: per-doc signals + the FIRST failing rule in
    * Gopher's published order, or `keep`.
    *
    * Threshold defaults are the paper's; the classifier operates on
    * \n-delimited lines and space-delimited words (all whitespace
    * runs collapse to one space for word statistics).
    */
  def gopherRules(df: DataFrame, textCol: String, idCol: String,
                  minWords: Long = 50, maxWords: Long = 100000,
                  minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
                  maxSymbolWordRatio: Double = 0.1,
                  maxBulletLineFrac: Double = 0.9,
                  maxEllipsisLineFrac: Double = 0.3,
                  minAlphaWordRatio: Double = 0.8,
                  minStopwords: Long = 2): DataFrame = {
    val c = col(textCol)
    val wn = regexp_replace(trim(c), "\\s+", " ") // one-space word form
    val nWords = when(length(wn) === 0, 0L).otherwise(size(split(wn, " ")).cast("long"))
    val wordChars = length(regexp_replace(wn, " ", ""))
    val frac4 = (num: Column, den: Column) =>
      when(den > 0, round(num * 10000.0 / den).cast("long") / 10000.0)
    val meanWordLen = frac4(wordChars, nWords)
    // '#' occurrences + non-overlapping '...' occurrences, Gopher's
    // symbol set
    val symbols = (length(c) - length(regexp_replace(c, "#", ""))) +
      regexp_count(c, lit("\\.\\.\\."))
    val nLines = size(split(c, "\n")).cast("long")
    // lookbehind anchor, NOT (?m)^: Java's MULTILINE treats \r, NEL
    // (U+0085), and the U+2028/U+2029 separators as line starts too,
    // while n_lines (and any SQL re-derivation via chr(10) splits)
    // recognizes only \n — a document using \r separators would
    // otherwise count more bullet lines than it has lines
    val bulletLines = regexp_count(c, lit("(?<=^|\\n)[-*•] "))
    // lookahead anchor (not (?m)$): a line ending in 6+ dots must
    // count ONCE — only the final three dots of a line satisfy the
    // lookahead, so the count is exactly |lines ending in '...'|
    val ellipsisLines = regexp_count(c, lit("\\.\\.\\.(?=\\n|\\z)"))
    // a word is alphabetic iff it contains >= 1 ASCII letter; count
    // the complement (runs of non-letter chars spanning a whole
    // token) in ONE codegen'd regex pass — no interpreted lambda
    val nonAlphaWords = regexp_count(concat(lit(" "), wn),
      lit("[ ][^ a-zA-Z]+(?=[ ]|\\z)"))
    val alphaRatio = frac4(nWords - nonAlphaWords, nWords)
    // DISTINCT presence over Gopher's 8-stopword set (>= 2 required)
    val stopSet = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val stopPresent = stopSet.map(w =>
      when(stopwordHits(lower(wn), Seq(w)) > 0, 1L).otherwise(0L))
      .reduce(_ + _)
    df.select(col(idCol),
        nWords.as("n_words"), meanWordLen.as("mean_word_len"),
        frac4(symbols, nWords).as("symbol_word_ratio"),
        frac4(bulletLines, nLines).as("bullet_line_frac"),
        frac4(ellipsisLines, nLines).as("ellipsis_line_frac"),
        alphaRatio.as("alpha_word_ratio"),
        stopPresent.as("stopwords_present"))
      .withColumn("reason",
        when(col("n_words") < minWords, "too_few_words")
          .when(col("n_words") > maxWords, "too_many_words")
          .when(col("mean_word_len") < minMeanWordLen
            || col("mean_word_len") > maxMeanWordLen, "word_len_out_of_range")
          .when(col("symbol_word_ratio") > maxSymbolWordRatio, "too_many_symbols")
          .when(col("bullet_line_frac") > maxBulletLineFrac, "too_many_bullets")
          .when(col("ellipsis_line_frac") > maxEllipsisLineFrac, "too_many_ellipses")
          .when(col("alpha_word_ratio") < minAlphaWordRatio, "low_alpha")
          .when(col("stopwords_present") < minStopwords, "few_stopwords")
          .otherwise("keep"))
  }

  /** One-call corpus "datasheet": the top-line numbers a dataset card
    * reports — size, token volume, exact-duplicate rate, empty-doc
    * rate, language spread — as a tall (metric, value) frame.
    * ONE pass computes per-doc features (token count, content
    * fingerprint, language, emptiness); the global aggregate and the
    * language-mix aggregate both read that pinned frame, and the two
    * single-row results cross-join broadcast into the tall output.
    * Rates are ratios of exact counts (round 4) — engine-exact.
    */
  def corpusDatasheet(df: DataFrame, textCol: String, idCol: String,
                      langCol: String): DataFrame = {
    val feats = graft.CacheScope.persist(df.select(
      wordCount(col(textCol)).cast("long").as("toks"),
      md5(coalesce(col(textCol), lit("")).cast("string")).as("fp"),
      coalesce(col(langCol).cast("string"), lit("<null>")).as("lang"),
      (length(trim(coalesce(col(textCol), lit("")))) === 0).as("is_empty")))
    val g = feats.agg(
      count(lit(1)).as("n_docs"),
      sum(col("toks")).as("n_tokens"),
      countDistinct(col("fp")).as("n_distinct"),
      count(when(col("is_empty"), 1)).as("n_empty"),
      countDistinct(col("lang")).as("n_langs"))
    val langTop = feats.groupBy("lang").agg(count(lit(1)).as("c"))
      .agg(max(col("c")).as("top_lang_docs"))
    val row = g.crossJoin(broadcast(langTop))
    row.select(expr(
      """stack(7,
        |  'n_docs', CAST(n_docs AS DOUBLE),
        |  'n_tokens', CAST(n_tokens AS DOUBLE),
        |  'avg_tokens', round(n_tokens / CAST(n_docs AS DOUBLE), 4),
        |  'exact_dup_rate', round((n_docs - n_distinct) / CAST(n_docs AS DOUBLE), 4),
        |  'empty_rate', round(n_empty / CAST(n_docs AS DOUBLE), 4),
        |  'n_langs', CAST(n_langs AS DOUBLE),
        |  'top_lang_share', round(top_lang_docs / CAST(n_docs AS DOUBLE), 4)
        |) AS (metric, value)""".stripMargin))
  }

  /** Sequence-length distribution in power-of-two buckets — the
    * batch-planning view of a corpus (how much of the data packs into
    * 512/1k/2k/4k-token contexts). Bucket b covers [2^(b−1), 2^b − 1]
    * tokens; b = bit-width of the count (length of its binary form),
    * an INTEGER derivation on both Spark and any SQL oracle — no
    * float log2 whose rounding could flip a boundary doc. One
    * scan-local projection + one tiny aggregation.
    */
  def seqLenHistogram(df: DataFrame, textCol: String): DataFrame = {
    val n = wordCount(col(textCol)).cast("long")
    df.select(
      when(n === 0, 0).otherwise(length(bin(n))).cast("int").as("bucket"), n.as("_n"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("docs"), sum(col("_n")).as("tokens"))
      // shiftleft's Scala binding takes a literal shift; the SQL form
      // accepts a column
      .withColumn("lo", when(col("bucket") === 0, 0L)
        .otherwise(expr("shiftleft(1L, bucket - 1)")))
      .withColumn("hi", when(col("bucket") === 0, 0L)
        .otherwise(expr("shiftleft(1L, bucket) - 1")))
      .select(col("bucket"), col("lo"), col("hi"), col("docs"), col("tokens"))
  }

  /** Exact-substring canary scan (SURVEY §2 D74): which of a bounded
    * needle bank (eval canaries, secret markers, blocklist phrases)
    * occurs verbatim in each document — the gap D23's shingle overlap
    * (needs a shared n-gram) and D62's embedding bank (catches
    * paraphrase, not verbatim) both leave. One Aho–Corasick automaton
    * in one codegen object: a single MAP-ONLY pass regardless of bank
    * size. Returns the matched needle ids (distinct, ascending;
    * empty = clean).
    */
  def canaryHits(c: org.apache.spark.sql.Column,
                 needles: Seq[String]): org.apache.spark.sql.Column =
    graft.functions.MultiContains(c, needles)

  /** Tall drill-down: one (id, needle_id, needle) row per hit; clean
    * docs emit nothing. Scan-local explode — no shuffle.
    */
  def canaryScan(df: DataFrame, textCol: String, idCol: String,
                 needles: Seq[String]): DataFrame = {
    val lookup = needles.zipWithIndex
      .foldLeft(lit(null).cast("string")) { case (acc, (n, i)) =>
        when(col("needle_id") === i, lit(n)).otherwise(acc)
      }
    df.select(col(idCol), explode(canaryHits(col(textCol), needles))
        .as("needle_id"))
      .withColumn("needle", lookup)
  }
}
