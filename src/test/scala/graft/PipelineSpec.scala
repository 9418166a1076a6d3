package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Pipeline

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("withSplit assigns all three labels, deterministically and partition-invariantly") {
    val df = (1 to 600).map(i => s"document number $i").toDF("text")
    def counts(parts: Int): Map[String, Long] =
      Pipeline.withSplit(df.repartition(parts), "text")
        .groupBy("split").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val c7 = counts(7)
    assert(counts(3) == c7, "split must not depend on partitioning")
    assert(c7.keySet == Set("train", "val", "test"))
    assert(c7("train") > c7("val") && c7("train") > c7("test"))
    assert(c7.values.sum == 600)
    // ~80/10/10 with binomial noise
    assert(c7("train") > 420 && c7("train") < 540)
  }

  test("exact duplicate content is co-assigned to the same split") {
    val df = Seq("same doc", "same doc", "other doc").toDF("text")
    val bySplit = Pipeline.withSplit(df, "text")
      .filter(col("text") === "same doc").select("split")
      .collect().map(_.getString(0)).toSet
    assert(bySplit.size == 1)
  }

  test("sampleByHash is deterministic, fraction-accurate, and salt-decorrelated") {
    val df = (1L to 2000L).toDF("id")
    def ids(salt: String): Set[Long] =
      Pipeline.sampleByHash(df, col("id"), 0.2, salt)
        .collect().map(_.getLong(0)).toSet
    val a = ids("a")
    assert(a == ids("a"), "same salt must select the same rows")
    assert(a.size > 300 && a.size < 500, s"got ${a.size} for fraction 0.2")
    val b = ids("b")
    assert(b != a, "different salts must select different row sets")
    // overlap should look independent (~0.04 of 2000), not nested
    assert(a.intersect(b).size < 200)
  }

  test("redactPii masks emails and 10+-digit runs, leaves short numbers") {
    val got = Seq(
      "mail bob.smith@x.co.uk and 12345678901 plus 12345 end",
      "no pii here",
      "UPPER@EXAMPLE.ORG 9999999999")
      .toDF("t").select(Pipeline.redactPii(col("t")).as("r"))
      .collect().map(_.getString(0))
    assert(got(0) == "mail <EMAIL> and <NUM> plus 12345 end")
    assert(got(1) == "no pii here")
    assert(got(2) == "<EMAIL> <NUM>")
  }

  test("packSequences: concat-and-chunk layout, straddling docs, deterministic") {
    // one bucket => one stream ordered by id: tokens 300,300,200 at
    // L=512 -> offsets 0,300,600: doc2 straddles packs 0/1, doc3
    // starts in pack 1 at offset 88
    val df = Seq((1L, 300), (2L, 300), (3L, 200)).toDF("id", "tok")
    val got = Pipeline.packSequences(df, col("id"), col("tok"), 512, buckets = 1)
      .collect().map(r => r.getLong(0) -> (r.getString(2), r.getLong(3))).toMap
    assert(got(1L) == (("0_0", 0L)))
    assert(got(2L) == (("0_0", 300L)))
    assert(got(3L) == (("0_1", 88L))) // (300+300) mod 512
    // multi-bucket: pack ids namespace by bucket, assignment is stable
    val many = (0L until 500L).map(i => (i, 10)).toDF("id", "tok")
    val a = Pipeline.packSequences(many, col("id"), col("tok"), 128, buckets = 4)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val b = Pipeline.packSequences(many, col("id"), col("tok"), 128, buckets = 4)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a == b)
    assert(a.values.map(_.split("_")(0)).toSet.size == 4, "all four bucket streams used")
  }

  test("stratifiedSampleByHash: per-stratum quotas, deterministic, default fraction") {
    val df = (0L until 3000L).map(i => (i, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c"))
      .toDF("id", "s")
    val kept = Pipeline.stratifiedSampleByHash(
      df, col("id"), col("s"), Map("a" -> 0.5, "b" -> 0.05), defaultFraction = 1.0)
    val counts = kept.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("a") - 500L) < 80, s"~50% of stratum a: $counts")
    assert(math.abs(counts("b") - 50L) < 40, s"~5% of stratum b: $counts")
    assert(counts("c") == 1000L, "default 1.0 keeps every c row")
    // determinism: identical kept set on re-evaluation
    val again = Pipeline.stratifiedSampleByHash(
      df, col("id"), col("s"), Map("a" -> 0.5, "b" -> 0.05), defaultFraction = 1.0)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == kept.select("id").collect().map(_.getLong(0)).toSet)
  }

  test("samplePerStratum: exact quota per stratum, deterministic, partition-invariant") {
    val df = (1 to 100).map(i => (i.toLong, s"src${i % 3}")).toDF("id", "src")
    def pick(parts: Int): Seq[(String, Long)] =
      Pipeline.samplePerStratum(df.repartition(parts), col("src"), col("id"), 4)
        .collect().map(r => (r.getString(1), r.getLong(0))).toSeq.sorted
    val p3 = pick(3)
    assert(pick(7) == p3, "sample must not depend on partitioning")
    assert(p3.groupBy(_._1).forall(_._2.size == 4))
    // a stratum smaller than k returns whole
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "src")
    val got = Pipeline.samplePerStratum(tiny, col("src"), col("id"), 5)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L))
  }

  test("tokenBudgetFractions: caps at 1.0, hits the budget in expectation, temperature extremes") {
    val df = Seq(("big", 8000L), ("small", 100L), ("mid", 1900L)).toDF("src", "toks")
    // temperature 1.0 (proportional): every source gets budget/total
    val prop = Pipeline.tokenBudgetFractions(df, col("toks"), col("src"), 5000, 1.0)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(prop.values.toSet == Set(0.5), s"proportional: $prop") // 5000/10000
    // budget >= corpus: everything kept whole
    val all = Pipeline.tokenBudgetFractions(df, col("toks"), col("src"), 20000, 1.0)
      .collect().map(_.getDouble(2)).toSet
    assert(all == Set(1.0))
    // temperature 0: uniform target budget/3 per source; "small" (100
    // tokens) is taken whole, others get (5000/3)/tokens
    val uni = Pipeline.tokenBudgetFractions(df, col("toks"), col("src"), 5000, 0.0)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(uni("small") == 1.0)
    assert(math.abs(uni("big") - 5000.0 / 3 / 8000) < 1e-4, s"uniform: $uni")
    // temperature 0.5 upweights the small source vs proportional
    val half = Pipeline.tokenBudgetFractions(df, col("toks"), col("src"), 5000, 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(half("small") > prop("small") && half("big") < uni("big") + 1.0)
  }

  test("chunkDocs: window arithmetic, overlap coverage, ragged tail, short/empty docs") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 tokens, 2 chunks at L=6,S=4
      (2L, "a b c"),                                  // shorter than one window
      (3L, "   "),                                    // whitespace-only: no chunks
      (4L, (1 to 14).map(i => s"t$i").mkString("  ")) // multi-space; 14 toks -> 3 chunks
    ).toDF("doc_id", "text")
    val out = Pipeline.chunkDocs(docs, "text", "doc_id", chunkLen = 6, overlap = 2)
      .orderBy("doc_id", "chunk_id").collect()
    val byDoc = out.groupBy(_.getLong(0))
    // doc 1: chunk0 = w1..w6 at 0, chunk1 = w5..w10 at 4 (stride 4)
    val d1 = byDoc(1L)
    assert(d1.length == 2)
    assert(d1(0).getLong(2) == 0 && d1(0).getLong(3) == 6
      && d1(0).getString(4) == "w1 w2 w3 w4 w5 w6")
    assert(d1(1).getLong(2) == 4 && d1(1).getLong(3) == 6
      && d1(1).getString(4) == "w5 w6 w7 w8 w9 w10")
    // doc 2: one short chunk, whole doc
    val d2 = byDoc(2L)
    assert(d2.length == 1 && d2(0).getLong(3) == 3 && d2(0).getString(4) == "a b c")
    // doc 3 gone entirely
    assert(!byDoc.contains(3L))
    // doc 4: 14 tokens -> last chunk index ceil((14-6)/4)=2; tail is
    // ragged (tokens 9..14, 6 long here since 14-8=6 exactly fills)
    val d4 = byDoc(4L)
    assert(d4.length == 3 && d4(2).getLong(2) == 8 && d4(2).getLong(3) == 6)
    // overlap coverage: consecutive chunks share exactly `overlap`
    // tokens and their union covers every token once in order
    val rebuilt = d4.map(_.getString(4).split(" ")).reduce { (acc, next) =>
      assert(acc.takeRight(2).sameElements(next.take(2)), "chunks must overlap by 2")
      acc ++ next.drop(2)
    }
    assert(rebuilt.sameElements((1 to 14).map(i => s"t$i")))
  }

  test("leakageSafeSplit: a component never straddles a split; singletons match withSplit") {
    val docs = (1L to 300L).map(i => (i, s"doc body $i")).toDF("doc_id", "text")
    // two engineered near-dup clusters: {1,2,3} (chain) and {10,11}
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Pipeline.leakageSafeSplit(docs, "doc_id", pairs)
      .select("doc_id", "group_id", "split").collect()
    val m = out.map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(Seq(1L, 2L, 3L).map(m(_)).distinct.size == 1,
      "cluster {1,2,3} must share group AND split")
    assert(m(10L) == m(11L))
    assert(m(1L)._1 == 1L && m(10L)._1 == 10L, "group id = min member")
    // untouched docs: group = own id, split identical to plain withSplit
    val plain = Pipeline.withSplit(docs.filter(col("doc_id") > 20), "doc_id")
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    plain.foreach { case (id, s) =>
      assert(m(id)._1 == id && m(id)._2 == s, s"singleton $id must match withSplit")
    }
    // determinism across partitionings
    val out2 = Pipeline.leakageSafeSplit(docs.repartition(7), "doc_id", pairs.repartition(3))
      .select("doc_id", "group_id", "split").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out2 == m)
  }

  // --- D48 cluster-balanced subsample ---

  private def clustered(sizes: Map[Int, Int]) =
    sizes.toSeq.flatMap { case (cl, n) =>
      (1 to n).map(i => (cl * 1000L + i, cl))
    }.toDF("id", "cluster")

  test("clusterBalancedSample: proportional quotas at temperature 1") {
    val df = clustered(Map(0 -> 8, 1 -> 2))
    val kept = Pipeline.clusterBalancedSample(df, col("cluster"), col("id"),
      budget = 5, temperature = 1.0)
      .groupBy("cluster").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // w = n·1e6 → quotas = floor(5·8/10)=4, floor(5·2/10)=1
    assert(kept == Map(0 -> 4L, 1 -> 1L))
  }

  test("clusterBalancedSample: uniform at temperature 0, capped at cluster size") {
    val df = clustered(Map(0 -> 8, 1 -> 1))
    val kept = Pipeline.clusterBalancedSample(df, col("cluster"), col("id"),
      budget = 10, temperature = 0.0)
      .groupBy("cluster").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // uniform quota 5 per cluster; cluster 1 only has 1 member
    assert(kept == Map(0 -> 5L, 1 -> 1L))
  }

  test("clusterBalancedSample: floor allocation may underfill, never overfills") {
    val df = clustered(Map(0 -> 3, 1 -> 3))
    val n = Pipeline.clusterBalancedSample(df, col("cluster"), col("id"),
      budget = 5, temperature = 1.0).count()
    // equal weights: floor(5/2)=2 each — 4 kept out of budget 5
    assert(n == 4L)
  }

  test("clusterBalancedSample is partitioning-invariant") {
    val df = clustered(Map(0 -> 20, 1 -> 7, 2 -> 3))
    val a = Pipeline.clusterBalancedSample(df, col("cluster"), col("id"),
      budget = 12).select("id").collect().map(_.getLong(0)).toSet
    val b = Pipeline.clusterBalancedSample(df.repartition(13), col("cluster"),
      col("id"), budget = 12).select("id").collect().map(_.getLong(0)).toSet
    assert(a == b && a.size <= 12)
  }

  test("weightedSampleTopK: dominant weights win, determinism, zero/null excluded") {
    val df = (1L to 200L).map { i =>
      (i, if (i <= 5) 1e9 else if (i % 50 == 0) 0.0 else 1.0)
    }.toDF("id", "w")
      .union(Seq((999L, null.asInstanceOf[java.lang.Double])).toDF("id", "w"))
    val (s1, g) = Pipeline.weightedSampleTopKAndGuard(df, "id", "w", 20)
    val ids = s1.select("id").collect().map(_.getLong(0)).toSet
    // ln(1e9) ≈ 20.7 in micro units dwarfs any Gumbel draw (<~ 3e6
    // micro at these uniforms): the five heavy docs are always in
    assert((1L to 5L).forall(ids.contains), s"heavy docs missing: $ids")
    assert(!ids.contains(999L) && !ids.exists(_ % 50 == 0),
      "null/zero weights must never be sampled")
    assert(ids.size == 20)
    // deterministic under repartitioning
    val s2 = Pipeline.weightedSampleTopK(df.repartition(13), "id", "w", 20)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(s2 == ids)
    // the guard covers the corpus and is comfortably off-boundary here
    assert(g.head().getDouble(0) > 1e-7)
    // uniform weights degenerate to the pure-Gumbel order: ln(1) = 0
    val uni = (1L to 100L).map((_, 1.0)).toDF("id", "w")
    val a = Pipeline.weightedSampleTopK(uni, "id", "w", 10)
      .select("id").collect().map(_.getLong(0)).toSeq
    val b = Pipeline.weightedSampleTopK(uni.withColumn("w", lit(1.0)), "id", "w", 10)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(a == b)
  }
}
