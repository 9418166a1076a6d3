package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE merge induction (SURVEY §2 D84) — bootstrap a
  * byte-pair-encoding tokenizer from the corpus itself (Sennrich,
  * Haddow & Birch, "Neural Machine Translation of Rare Words with
  * Subword Units", ACL 2016): repeatedly merge the most frequent
  * adjacent symbol pair, starting from characters. The step every
  * from-scratch training-data pipeline runs before it can even COUNT
  * tokens in its own tokenizer.
  *
  * Scale shape (the practical distributed-BPE factorization): the
  * corpus is scanned ONCE — a single map-side-combined word-count
  * groupBy. All `numMerges` iterations then run on the WORD-FREQUENCY
  * frame (vocabulary-sized, persisted; millions of rows for a web
  * corpus, never corpus-sized): per iteration one pair-count groupBy
  * + a TakeOrdered-1 argmax (bounded driver action) + one codegen'd
  * `replace` projection. Applying learned merges back to the corpus
  * ([[applyMerges]]) is a chain of N `replace` expressions in ONE
  * map-only projection — no join, no shuffle, no UDF.
  *
  * Determinism: each symbol rides wrapped in its own U+0001
  * delimiters — "abc" is ␁a␁␁b␁␁c␁ (a DOUBLE delimiter between
  * symbols, single at the ends) — so the pair pattern ␁l␁␁r␁ never
  * shares a character with an adjacent occurrence, and standard
  * non-overlapping left-to-right `replace` is EXACTLY the greedy
  * BPE merge: a·a·a·a → (aa)·(aa), a·a·a → (aa)·a, ab·ab merges
  * both. (With a SHARED middle delimiter — the r12 code-review
  * catch — the second of two adjacent occurrences lost its leading
  * delimiter to the first match and under-merged.) The
  * argmax tie-breaks on (count DESC, left ASC, right ASC) — a total
  * order, so the merge table is bit-identical across engines,
  * partitionings, and runs. Words are whitespace tokens of the raw
  * text; characters are the initial symbols (no end-of-word marker —
  * document-internal BPE; the delimiter char itself must not occur
  * in the text, which holds for any sane corpus).
  */
object Bpe {

  private val D = ""

  /** chars of `w` each wrapped in delimiters:
    * "abc" -> ␁a␁␁b␁␁c␁
    */
  private def delimited(w: Column): Column =
    concat(lit(D), array_join(
      filter(split(w, ""), s => length(s) > 0), D + D), lit(D))

  /** One merge-table row. */
  final case class Merge(rank: Int, left: String, right: String, cnt: Long)

  /** Learn the top-`numMerges` BPE merges. Returns (rank, left,
    * right, merged, pair_count) rows, rank 1..N in learn order;
    * stops early (fewer rows) if no adjacent pair remains.
    */
  def learnMerges(df: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    // ONE corpus scan: word frequencies (map-side combined)
    var words = graft.CacheScope.persist(
      df.select(explode(split(trim(col(textCol)), " +")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("w").agg(count(lit(1)).as("cnt"))
        .select(delimited(col("w")).as("s"), col("cnt")))
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rank = 1
    while (rank <= numMerges) {
      // adjacent symbol pairs of each word, weighted by word count
      val syms = split(regexp_replace(col("s"), s"^$D|$D$$", ""), D + D)
      val top = words
        .select(col("cnt"), syms.as("y"))
        .filter(size(col("y")) >= 2)
        .select(col("cnt"), explode(expr(
          "transform(sequence(0, size(y) - 2)," +
            " i -> struct(y[i] AS l, y[i + 1] AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) rank = numMerges + 1
      else {
        val m = Merge(rank, top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += m
        words = graft.CacheScope.persist(words.select(
          call_function("replace", col("s"),
            lit(s"$D${m.left}$D$D${m.right}$D"),
            lit(s"$D${m.left}${m.right}$D")).as("s"),
          col("cnt")))
        rank += 1
      }
    }
    merges.toSeq
      .map(m => (m.rank, m.left, m.right, m.left + m.right, m.cnt))
      .toDF("rank", "left", "right", "merged", "pair_count")
  }

  /** Tokenize `textCol` with a learned merge table: per word, start
    * from characters and apply every merge in rank order — a chain of
    * N codegen'd `replace`s inside one map-only projection (the
    * corpus-side cost of a trained BPE is a single scan). Adds
    * `bpe_text` (the delimited symbol stream, words joined by ' ')
    * and `bpe_tokens` (per-document symbol count).
    */
  def applyMerges(df: DataFrame, textCol: String,
                  merges: Seq[(String, String)]): DataFrame = {
    def encodeWord(w: Column): Column =
      merges.foldLeft(delimited(w)) { case (acc, (l, r)) =>
        call_function("replace", acc, lit(s"$D$l$D$D$r$D"), lit(s"$D$l$r$D"))
      }
    df.withColumn("_enc", transform(
        filter(split(trim(col(textCol)), " +"), s => length(s) > 0),
        w => encodeWord(w)))
      .withColumn("bpe_text", array_join(col("_enc"), " "))
      // symbols per encoded word = segments between DOUBLE delimiters
      // (the single outer delimiters ride inside the end segments)
      .withColumn("bpe_tokens", aggregate(
        transform(col("_enc"), e => size(split(e, D + D)).cast("long")),
        lit(0L), (a, x) => a + x))
      .drop("_enc")
  }
}
