package graft

import org.apache.spark.sql.functions._
import graft.text.Bm25

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  // the exact double tree Bm25 builds (same association order), for
  // hand-verification: idf * tfn * 1e6 over exact integer inputs
  private def contrib(tf: Long, df: Long, dl: Long,
                      n: Double, sumdl: Double): Double = {
    val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    val tfn = tf * (1.2 + 1.0) /
      (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl * n / sumdl))
    idf * tfn * 1e6
  }

  private val corpus = Seq(
    (1L, "a a b"), (2L, "a c"), (3L, "b c c d"),
    (4L, null.asInstanceOf[String]), (5L, "   "))
    .toDF("doc_id", "text")

  test("hand-computed BM25 on a tiny corpus; null/blank docs never match or count") {
    // docs 4 (null) and 5 (blank) have no postings: N=3, sumdl=9
    val q = Seq((10L, "a d b")).toDF("qid", "qtext")
    val got = Bm25.bm25TopK(corpus, "doc_id", "text", q, "qid", "qtext", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = 3.0; val sumdl = 9.0
    val s1 = math.round(contrib(2, 2, 3, n, sumdl)) + // a in doc1
      math.round(contrib(1, 2, 3, n, sumdl))          // b in doc1
    val s2 = math.round(contrib(1, 2, 2, n, sumdl))   // a in doc2
    val s3 = math.round(contrib(1, 2, 4, n, sumdl)) + // b in doc3
      math.round(contrib(1, 1, 4, n, sumdl))          // d in doc3
    val expected = Seq((1L, s1), (2L, s2), (3L, s3))
      .sortBy { case (id, s) => (-s, id) }
      .zipWithIndex.map { case ((id, s), i) => (10L, i + 1L, id, s) }
    assert(got.sortBy(_._2).toSeq == expected)
  }

  test("query term SET semantics: duplicated query terms count once") {
    val q = Seq((12L, "a a a"), (13L, "a")).toDF("qid", "qtext")
    val got = Bm25.bm25TopK(corpus, "doc_id", "text", q, "qid", "qtext", 10)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getLong(3))).toMap
    val by12 = got.collect { case ((12L, d), s) => d -> s }.toMap
    val by13 = got.collect { case ((13L, d), s) => d -> s }.toMap
    assert(by12 == by13 && by12.nonEmpty)
  }

  test("absent-term query yields no rows; partially-absent contributes only present terms") {
    val q = Seq((20L, "zzz qqq"), (21L, "zzz a")).toDF("qid", "qtext")
    val got = Bm25.bm25TopK(corpus, "doc_id", "text", q, "qid", "qtext", 10)
      .collect()
    assert(!got.exists(_.getLong(0) == 20L))
    val q21 = got.filter(_.getLong(0) == 21L).map(r => (r.getLong(2), r.getLong(3)))
    val justA = Bm25.bm25TopK(corpus, "doc_id", "text",
      Seq((21L, "a")).toDF("qid", "qtext"), "qid", "qtext", 10)
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(q21.toSeq == justA.toSeq)
  }

  test("ties rank by doc_id ascending; k truncates") {
    val dup = Seq((7L, "x y"), (3L, "x y"), (9L, "x y")).toDF("doc_id", "text")
    val q = Seq((1L, "x")).toDF("qid", "qtext")
    val got = Bm25.bm25TopK(dup, "doc_id", "text", q, "qid", "qtext", 2)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 3L), (2L, 7L)))
  }

  test("partitioning invariance: 1 vs 7 partitions bit-identical") {
    val docs = (1L to 120L)
      .map(i => (i, s"w${i % 9} w${i % 5} w${(i * 7) % 11} w${i % 9}"))
      .toDF("doc_id", "text")
    val q = Seq((1L, "w0 w3"), (2L, "w7 w10 w1")).toDF("qid", "qtext")
    def run(parts: Int) =
      Bm25.bm25TopK(docs.repartition(parts), "doc_id", "text",
        q, "qid", "qtext", 15)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2)).toSeq
    assert(run(1) == run(7))
  }

  test("plan: no Window; map-side-combining ObjectHashAggregate top-k") {
    val q = Seq((1L, "a b")).toDF("qid", "qtext")
    val plan = Bm25.bm25TopK(corpus, "doc_id", "text", q, "qid", "qtext", 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "BM25 top-k must not rank via a window")
    assert(plan.contains("ObjectHashAggregate"),
      "expected the TypedImperativeAggregate map-side combine")
  }

  test("boundary guard: populated in (0, 0.5]; 0.5 when nothing scored") {
    val q = Seq((10L, "a d b")).toDF("qid", "qtext")
    val (_, g) = Bm25.bm25TopKAndGuard(corpus, "doc_id", "text",
      q, "qid", "qtext", 10)
    val d = g.collect()(0).getDouble(0)
    assert(d > 0 && d <= 0.5)
    val (_, g2) = Bm25.bm25TopKAndGuard(corpus, "doc_id", "text",
      Seq((1L, "zzz")).toDF("qid", "qtext"), "qid", "qtext", 10)
    assert(g2.collect()(0).getDouble(0) == 0.5)
  }
}
