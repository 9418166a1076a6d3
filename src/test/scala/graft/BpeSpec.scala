package graft

import org.apache.spark.sql.functions._
import graft.text.Bpe

/** D84 BPE merge induction: the Sennrich et al. hand example,
  * tie-break determinism, early stop, and the map-only apply path.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learnMerges reproduces the classic hand-computed example") {
    // low x3, lower, lowest. Pair counts: (l,o)=5 (o,w)=5 (w,e)=2
    // (e,r)=1 (e,s)=1 (s,t)=1. Ties break (count DESC, left ASC,
    // right ASC): iter1 (l,o) [beats (o,w) on left], iter2 (lo,w),
    // iter3 (low,e), iter4 (lowe,r) [beats (lowe,s) on right and
    // (s,t) on left].
    val df = Seq("low low low lower lowest").toDF("text")
    val m = Bpe.learnMerges(df, "text", 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(m.toSeq == Seq(
      (1, "l", "o", "lo", 5L),
      (2, "lo", "w", "low", 5L),
      (3, "low", "e", "lowe", 2L),
      (4, "lowe", "r", "lower", 1L)))
  }

  test("learnMerges stops early when no pair remains") {
    val df = Seq("ab ab a").toDF("text")
    // iter1 merges (a,b) cnt 2; after that 'ab' and 'a' are single
    // symbols -> no pairs -> stop with 1 row despite numMerges=5
    val m = Bpe.learnMerges(df, "text", 5).collect()
    assert(m.length == 1 && m(0).getString(3) == "ab")
  }

  test("greedy overlap: a·a·a merges left-to-right to (aa)·a") {
    val df = Seq("aaa aaa aa").toDF("text")
    // pairs: (a,a) = 2+2+1 = 5 -> merge 1 = (a,a).
    // aaa -> aa,a ; aa -> aa. Next pairs: (aa,a)=2 -> merge 2.
    val m = Bpe.learnMerges(df, "text", 2).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    assert(m.toSeq == Seq(("a", "a", 5L), ("aa", "a", 2L)))
  }

  test("adjacent repeats merge completely: a^4 -> (aa)(aa), abab -> (ab)(ab)") {
    // the r12 code-review catch: with a SHARED middle delimiter the
    // second of two adjacent occurrences lost its leading delimiter
    // to the first match and under-merged (aaaa -> aa,a,a and
    // abab -> ab,a,b) — the doubled inter-symbol delimiter makes
    // non-overlapping replace exactly greedy
    val m1 = Bpe.learnMerges(Seq("aaaa aaaa").toDF("text"), "text", 2)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    // (a,a) = 3+3 = 6; aaaa -> aa,aa; then (aa,aa) = 2
    assert(m1.toSeq == Seq(("a", "a", 6L), ("aa", "aa", 2L)))
    val m2 = Bpe.learnMerges(Seq("abab abab ab").toDF("text"), "text", 2)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    // (a,b)=2+2+1=5 beats (b,a)=2 -> merge (a,b); abab -> ab,ab;
    // then (ab,ab)=2
    assert(m2.toSeq == Seq(("a", "b", 5L), ("ab", "ab", 2L)))
    // apply side agrees: encode a^5 under merges (a,a),(aa,aa)
    val enc = Bpe.applyMerges(Seq((1L, "aaaaa")).toDF("id", "text"), "text",
      Seq(("a", "a"), ("aa", "aa")))
    assert(enc.select("bpe_tokens").head().getLong(0) == 2L) // aaaa + a
  }

  test("applyMerges: map-only encode matches hand tokenization; plan has no shuffle") {
    val merges = Seq(("l", "o"), ("lo", "w"), ("low", "e"), ("lowe", "r"))
    val df = Seq((1L, "low lower lowest")).toDF("id", "text")
    val enc = Bpe.applyMerges(df, "text", merges)
    val r = enc.select("bpe_tokens", "bpe_text").head()
    assert(r.getLong(0) == 5L) // low(1) lower(1) lowe·s·t(3)
    assert(r.getString(1).count(_ == ' ') == 2)
    val plan = enc.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"apply must be one map-only projection:\n$plan")
  }

  test("batched induction ≡ sequential on classic and adversarial corpora") {
    // r13: learnMergesBatched must reproduce the sequential merge
    // table BIT-IDENTICALLY (ranks, pairs, counts) — the soundness
    // rule (disjoint contiguous prefix + strict-count cut) pinned on
    // corpora chosen to exercise ties, adjacent repeats, and symbol
    // reuse across candidate pairs
    val corpora = Seq(
      "low low low lower lowest",              // classic hand example
      "aaaa aaaa ab abab abab",                // adjacent repeats + shared symbols
      "xy xy yz yz zx zx xyz xyz xyz",         // tie-heavy triangle
      (0 until 40).map(i => s"spark sql engine row$i data").mkString(" "))
    for (text <- corpora; bs <- Seq(1, 3, 16)) {
      val df = Seq(text).toDF("text")
      val seqM = Bpe.learnMerges(df, "text", 12).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4))).toSeq
      val batM = Bpe.learnMergesBatched(df, "text", 12, batchSize = bs).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4))).toSeq
      assert(batM == seqM,
        s"batchSize=$bs diverged on '${text.take(30)}...':\n$batM\n!=\n$seqM")
    }
  }

  test("batched ≡ sequential at 256 merges with adaptive growth (r14)") {
    // a vocabulary rich enough to sustain 256 merges (~90 distinct
    // pseudo-words with deterministic letter structure and skewed
    // counts, so ties, clashes, AND full batches all occur); the
    // adaptive doubling must deliver the same bit-identical table
    // the sequential algorithm produces, in far fewer round-trips
    // 16 word FAMILIES over disjoint 7-char alphabets: within a
    // family merges chain (symbol-sequential, as in any corpus), but
    // across families the top pairs are symbol-DISJOINT, so the
    // count-sorted order interleaves batchable work — the shape that
    // makes batched induction pay on real text, reproduced small
    val pool = (('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') ++
      ('À' to 'Ö') ++ ('Ø' to 'ö')).mkString
    val rng = new scala.util.Random(42)
    val words = (0 until 320).map { i =>
      val alpha = pool.substring((i % 16) * 7, (i % 16) * 7 + 7)
      val len = 8 + rng.nextInt(7)
      val w = (0 until len).map(_ => alpha(rng.nextInt(7))).mkString
      Seq.fill(1 + rng.nextInt(40))(w).mkString(" ")
    }
    val df = Seq(words.mkString(" ")).toDF("text")
    val seqM = Bpe.learnMerges(df, "text", 256).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4))).toSeq
    val (batDf, stats) = Bpe.learnMergesBatchedWithStats(df, "text", 256)
    val batM = batDf.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4))).toSeq
    assert(batM == seqM)
    assert(seqM.size == 256)
    // amortization is the point: far fewer driver round-trips than merges
    assert(stats.length < 256 / 2, s"jobs=${stats.length} — no amortization")
  }

  test("segmented applyMerges ≡ single-projection; deep chains encode correctly") {
    // 70-merge chain collapsing one 71-char word to a single symbol;
    // segmentSize=16 forces 5 segments with checkpoint barriers
    val chars = (0 until 71).map(i => ('0' + i).toChar.toString)
    val word = chars.mkString
    val chain = (1 until chars.length).map(i => (chars.take(i).mkString, chars(i)))
    val df = Seq((1L, s"$word ${word.take(10)}")).toDF("id", "text")
    val one = Bpe.applyMerges(df, "text", chain, segmentSize = 1000)
      .select("bpe_tokens", "bpe_text").head()
    val seg = Bpe.applyMerges(df, "text", chain, segmentSize = 16)
      .select("bpe_tokens", "bpe_text").head()
    assert(one == seg, s"segmented diverged: $seg != $one")
    // full word -> 1 token; 10-char prefix merged by the first 9
    // chain entries -> 1 token
    assert(one.getLong(0) == 2L, s"expected 2 tokens, got $one")
  }

  test("null and empty text encode as the empty document, not NULL") {
    val df = Seq((1L, null: String), (2L, ""), (3L, "ab ab"))
      .toDF("id", "text")
    val enc = Bpe.applyMerges(df, "text", Seq(("a", "b")))
      .select("id", "bpe_tokens", "bpe_text").orderBy("id").collect()
    assert(enc(0).getLong(1) == 0L && enc(0).getString(2) == "")
    assert(enc(1).getLong(1) == 0L && enc(1).getString(2) == "")
    assert(enc(2).getLong(1) == 2L)
  }

  test("learned merges reduce token count on the training corpus") {
    val docs = (0 until 50).map(i => (i.toLong, s"spark sql spark engine row$i"))
      .toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, "text", 10).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val before = docs.select(sum(length(regexp_replace(col("text"), " ", ""))))
      .head().getLong(0)
    val after = Bpe.applyMerges(docs, "text", merges)
      .agg(sum(col("bpe_tokens"))).head().getLong(0)
    assert(after < before, s"10 merges must compress: $after !< $before")
  }
}
