package graft

import graft.dedup.Spans
import org.apache.spark.sql.functions._

/** D47 duplicate-span detection: window arithmetic, within-doc
  * repeats, stride semantics, and the map-only span-construction
  * plan shape.
  */
class SpansSpec extends SparkSpec {
  import spark.implicits._

  test("cross-document duplicated spans are flagged; unique docs score zero") {
    val docs = Seq(
      (1L, "a b c d e f g h"),        // identical to doc 2
      (2L, "a b c d e f g h"),
      (3L, "p q r s t u v w")         // unique
    ).toDF("doc_id", "text")
    val stats = Spans.duplicatedSpanStats(docs, "text", "doc_id", spanLen = 8)
      .orderBy("doc_id").collect()
    assert(stats.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 1L, 1L), (2L, 1L, 1L), (3L, 1L, 0L)))
    assert(stats(0).getDouble(3) == 1.0 && stats(2).getDouble(3) == 0.0)
  }

  test("within-document repetition counts as duplication") {
    // 16 tokens = the same 8-gram twice: 9 windows, the ones at pos 0
    // and pos 8 share a fingerprint, the 7 middles are unique
    val docs = Seq((1L, "a b c d e f g h a b c d e f g h")).toDF("doc_id", "text")
    val r = Spans.duplicatedSpanStats(docs, "text", "doc_id", spanLen = 8).collect()(0)
    assert(r.getLong(1) == 9L)
    assert(r.getLong(2) == 2L)
    assert(r.getDouble(3) == math.rint(2.0 / 9.0 * 1e4) / 1e4)
  }

  test("stride emits only full windows at stride offsets") {
    val docs = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")).toDF("doc_id", "text")
    val spans = Spans.spanHashes(docs, "text", "doc_id", spanLen = 4, stride = 4)
      .orderBy("span_pos").collect()
    // 10 tokens, L=4, stride 4: windows at 0 and 4 (a window at 8
    // would be ragged and is not emitted)
    assert(spans.map(_.getLong(1)).toSeq == Seq(0L, 4L))
  }

  test("documents shorter than spanLen contribute no spans") {
    val docs = Seq((1L, "a b c"), (2L, "   "), (3L, "a b c d")).toDF("doc_id", "text")
    val spans = Spans.spanHashes(docs, "text", "doc_id", spanLen = 4)
    assert(spans.select("doc_id").distinct().collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("duplicateSpans returns the exact flagged occurrences") {
    val docs = Seq(
      (1L, "x y z w a b c d"),
      (2L, "x y z w q r s t"),
      (3L, "m n o p q r s t")
    ).toDF("doc_id", "text")
    // L=4: "x y z w" occurs in docs 1+2 (pos 0); "q r s t" in docs
    // 2+3 (pos 4); everything else is unique
    val dup = Spans.duplicateSpans(docs, "text", "doc_id", spanLen = 4)
      .orderBy("doc_id", "span_pos").collect()
    assert(dup.map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq ==
      Seq((1L, 0L, 2L), (2L, 0L, 2L), (2L, 4L, 2L), (3L, 4L, 2L)))
  }

  test("span construction is map-only (no Exchange before aggregation)") {
    val docs = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val plan = Spans.spanHashes(docs, "text", "doc_id", spanLen = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free span plan:\n$plan")
  }

  test("winnowing: shared runs of window+k-1 tokens always share a fingerprint") {
    // doc 1 and 2 share an 8-token run (window 4 + k 5 - 1 = 8);
    // winnowing must give them >= 1 common fingerprint despite
    // different surrounding text
    val docs = Seq(
      (1L, "p1 p2 s1 s2 s3 s4 s5 s6 s7 s8 q1 q2"),
      (2L, "r1 r2 r3 s1 s2 s3 s4 s5 s6 s7 s8 u1 u2 u3")
    ).toDF("doc_id", "text")
    val fps = Spans.winnowFingerprints(docs, "text", "doc_id", k = 5, window = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val f1 = fps.filter(_._1 == 1L).map(_._2).toSet
    val f2 = fps.filter(_._1 == 2L).map(_._2).toSet
    assert((f1 & f2).nonEmpty, s"shared run must share a fingerprint: $f1 vs $f2")
  }

  test("winnowing stores fewer fingerprints than spans; short docs still fingerprint") {
    val long = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, long), (2L, "a b c d e f")).toDF("doc_id", "text")
    val spans1 = Spans.spanHashes(docs.filter($"doc_id" === 1), "text", "doc_id", 5).count()
    val fps = Spans.winnowFingerprints(docs, "text", "doc_id", k = 5, window = 4)
    val byDoc = fps.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc(1L) < spans1, "winnowing must thin the span set")
    // doc 2: 6 tokens -> 2 spans < window -> fallback emits exactly
    // the min of what exists
    assert(byDoc(2L) == 1L)
  }

  test("winnowOverlapPairs finds duplicated docs, dfCap drops template fingerprints") {
    val shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"
    val docs = Seq(
      (1L, shared), (2L, shared),              // near-identical pair
      (3L, "x1 x2 x3 x4 x5 x6 x7 x8")          // unrelated
    ).toDF("doc_id", "text")
    val pairs = Spans.winnowOverlapPairs(docs, "text", "doc_id", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
    // dfCap = 2 drops fingerprints present in > 2 docs: make the
    // shared text appear in 3 docs and every fingerprint dies
    val tri = Seq((1L, shared), (2L, shared), (3L, shared)).toDF("doc_id", "text")
    val capped = Spans.winnowOverlapPairs(tri, "text", "doc_id", k = 5, dfCap = 2)
    assert(capped.count() == 0)
  }

  test("novelSpanStats: store membership per ingested doc, batch never self-counts") {
    val store = Seq((10L, "a b c d e f g h")).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "a b c d e f g h"),            // entirely stale
      (2L, "p q r s t u v w"),            // entirely novel
      (3L, "p q r s t u v w x")           // 2 spans, both novel — doc 2's
                                          // identical span is BATCH, not store
    ).toDF("doc_id", "text")
    val out = Spans.novelSpanStats(batch, store, "text", "doc_id", spanLen = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq((1L, 1L, 1L, 1.0), (2L, 1L, 0L, 0.0), (3L, 2L, 0L, 0.0)))
  }

  test("xxhash64 fast path reproduces the span statistics (identities differ, counts agree)") {
    val docs = Seq(
      (1L, "a b c d e f g h a b c d e f g h"),
      (2L, "a b c d e f g h x y z w q r s t"),
      (3L, "p q r s t u v w m n o p q r s t")
    ).toDF("doc_id", "text")
    def stats(portable: Boolean) =
      Spans.duplicatedSpanStats(docs, "text", "doc_id", spanLen = 8,
        portableHash = portable).orderBy("doc_id").collect().map(_.toSeq).toSeq
    // occurrence counts are a pure function of span EQUALITY, so any
    // collision-free hash gives identical statistics
    assert(stats(true) == stats(false))
    // winnowing's min-per-window SELECTION depends on the hash (a
    // different function picks different representatives), so only
    // the guarantee is invariant: docs 1+2 share an 8-token run
    // (window+k-1) and must pair under EITHER hash
    def pairIds(portable: Boolean) =
      Spans.winnowOverlapPairs(docs, "text", "doc_id", k = 5, minShared = 1,
        portableHash = portable).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairIds(true).contains((1L, 2L)) && pairIds(false).contains((1L, 2L)))
  }

  test("staleSpans runs as a stateless STREAM-static join (append mode, no state)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = Seq((10L, "a b c d e f g h")).toDF("doc_id", "text")
    val fps = Spans.storeFingerprints(store, "text", "doc_id", spanLen = 8)
    val mem = MemoryStream[(Long, String)]
    val q = Spans.staleSpans(mem.toDF().toDF("doc_id", "text"), fps,
      "text", "doc_id", spanLen = 8)
      .writeStream.format("memory").queryName("stale_spans")
      .outputMode("append").start()
    try {
      mem.addData((1L, "a b c d e f g h"), (2L, "p q r s t u v w"))
      q.processAllAvailable()
      mem.addData((3L, "z a b c d e f g h"))   // stale span at pos 1
      q.processAllAvailable()
      val rows = spark.table("stale_spans").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows == Set((1L, 0L), (3L, 1L)))
    } finally q.stop()
  }

  test("fingerprint is the md5 15-nibble head (portable contract)") {
    val fp = Seq("a b c d").toDF("s")
      .select(Spans.spanFingerprint(col("s"))).collect()(0).getLong(0)
    val md5Head = java.security.MessageDigest.getInstance("MD5")
      .digest("a b c d".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    assert(fp == java.lang.Long.parseLong(md5Head, 16))
  }

  test("removeDuplicateSpans keeps the globally-first occurrence, drops covered tokens") {
    val docs = Seq(
      (1L, "a1 a2 D1 D2 D3 D4 a3 a4"), // keeper of "D1 D2 D3 D4" (smallest (id,pos))
      (2L, "b1 D1 D2 D3 D4 b2 b3 b4"), // loses the 4 covered tokens
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8"), // unique: untouched
      (4L, "tiny doc"),                // < spanLen: passes through
      (5L, "")                         // empty: stays empty
    ).toDF("doc_id", "text")
    val out = Spans.removeDuplicateSpans(docs, "text", "doc_id", spanLen = 4)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out(0) == ((1L, "a1 a2 D1 D2 D3 D4 a3 a4", 8L, 0L)))
    assert(out(1) == ((2L, "b1 b2 b3 b4", 8L, 4L)))
    assert(out(2) == ((3L, "c1 c2 c3 c4 c5 c6 c7 c8", 8L, 0L)))
    assert(out(3) == ((4L, "tiny doc", 2L, 0L)))
    assert(out(4) == ((5L, "", 0L, 0L)))
  }

  test("removeDuplicateSpans: overlapping windows of a long shared run merge into one removal") {
    // the 6-token run D1..D6 shared by docs 1 and 2 produces three
    // overlapping duplicated 4-token windows in each; in doc 2 their
    // coverage union removes the whole run, not 3x4 tokens
    val docs = Seq(
      (1L, "D1 D2 D3 D4 D5 D6 x1 x2"),
      (2L, "y1 y2 D1 D2 D3 D4 D5 D6")
    ).toDF("doc_id", "text")
    val out = Spans.removeDuplicateSpans(docs, "text", "doc_id", spanLen = 4)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    assert(out(0) == ((1L, "D1 D2 D3 D4 D5 D6 x1 x2", 0L)))
    assert(out(1) == ((2L, "y1 y2", 6L)))
  }

  test("removeDuplicateSpans: within-doc repeats keep only the first occurrence") {
    val docs = Seq(
      (1L, "R1 R2 R3 R4 z1 R1 R2 R3 R4 z2")
    ).toDF("doc_id", "text")
    val out = Spans.removeDuplicateSpans(docs, "text", "doc_id", spanLen = 4)
      .collect().map(r => (r.getString(1), r.getLong(3))).head
    assert(out == (("R1 R2 R3 R4 z1 z2", 4L)))
  }
}
