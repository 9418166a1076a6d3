package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.ann.Ann
import graft.profile.Profiler
import graft.quality.{Detector, Rule}
import graft.text.TextAnalysis
import graft.pipeline.Pipeline

/** Degenerate-input behavior: empty tables, all-null columns, single
  * rows. The oracle corpus never produces these, but a 100 TB
  * pipeline's partitions routinely do (empty partitions after a
  * selective filter, a column that is null for one whole source).
  */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")

  test("report survives empty tables, all-null columns, and single-type schemas") {
    // empty: every count metric 0, value-metrics null, but the full
    // metric grid still materializes (profile of nothing is not a crash)
    val emptyRep = Profiler.report(emptyDocs, approx = false).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(emptyRep(("*", "row_count")).getAs[Double]("value") == 0.0)
    assert(emptyRep(("text", "non_null")).getAs[Double]("value") == 0.0)
    assert(emptyRep(("text", "value_at_min_len")).getAs[String]("value_str") == null)
    assert(emptyRep(("doc_id", "mean")).get(2) == null)
    assert(emptyRep(("text", "fill_pct")).get(2) == null, "0/0 fill on empty is null, not an ANSI error")
    // the standalone profiles share the guarded-division fix
    assert(Profiler.nullProfile(emptyDocs).collect().forall(_.get(3) == null))
    assert(Profiler.signCounts(emptyDocs.select(col("doc_id")), "doc_id")
      .collect()(0).getAs[Long]("positive") == 0L)
    // all-null numeric column: stats null, counts zero, no exception
    val withNull = Seq((1L, None: Option[Double]), (2L, None)).toDF("id", "v")
    val nullRep = Profiler.report(withNull, approx = false).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(nullRep(("v", "cnt")).getAs[Double]("value") == 0.0)
    assert(nullRep(("v", "null_count")).getAs[Double]("value") == 2.0)
    assert(nullRep(("v", "mean")).get(2) == null)
    assert(nullRep(("v", "distinct_cnt")).getAs[Double]("value") == 0.0)
    // strings-only schema: no numeric/corr metrics, string ones intact
    val strOnly = Seq("a", "bb").toDF("s")
    val sRep = Profiler.report(strOnly, approx = false).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(sRep(("s", "max_len")).getAs[Double]("value") == 2.0)
    assert(!sRep.keys.exists(_._2.startsWith("pearson")))
    assert(sRep(("*", "numeric_column_count")).getAs[Double]("value") == 0.0)
  }

  test("zero denominators yield nulls/zeros, never ANSI divide-by-zero errors") {
    // DQ score of an EMPTY table: one row, null score, no crash
    val dq = Detector.dqReport(emptyDocs, "text", Seq(Rule.NoDigits)).collect()(0)
    assert(dq.getAs[Long]("null_records") == 0L && dq.get(4) == null)
    assert(Detector.dqSummary(emptyDocs, Seq("text" -> Seq(Rule.NoDigits)))
      .collect()(0).get(4) == null)
    // cosine against a ZERO VECTOR: null similarity (ranked last /
    // dropped by thresholds), not a runtime error
    val emb = Seq((1L, Array(1.0, 0.0)), (2L, Array(0.0, 0.0)),
      (3L, Array(1.0, 0.0))).toDF("vec_id", "embedding")
    val top = Ann.cosineTopK(emb, "embedding", "vec_id", Array(1.0, 0.0), 3)
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(top(1L).contains(1.0) && top(2L).isEmpty)
    // only the (1,3) pair survives; every zero-vector pair is null -> dropped
    assert(Ann.cosinePairsExact(emb, emb, "embedding", "vec_id", 0.1).count() == 1)
    // tf-idf pair whose every shared gram has idf 0 (both strings
    // identical across the whole corpus): null similarity -> no pair
    val flat = Seq((1L, "abcd"), (2L, "abcd")).toDF("id", "s")
    assert(graft.similarity.StringSim.similarPairs(flat, "s", "id", 0.1,
      relDfCap = Double.NaN).count() == 0)
    // moments of a CONSTANT column: undefined shape -> null, no crash
    val const = Seq.fill(5)(7.0).zipWithIndex.map(_.swap).toDF("id", "c")
    val mo = Profiler.moments(const, Seq("c")).collect()(0)
    assert(mo.getAs[Long]("cnt") == 5L && mo.get(2) == null && mo.get(3) == null)
    // a zero-token source keeps nothing instead of dividing by zero
    val mix = Pipeline.tokenBudgetFractions(
      Seq(("a", 100L), ("b", 0L)).toDF("src", "tok"), col("tok"), col("src"), 50L)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(mix("b") == 0.0 && mix("a") > 0.0)
  }

  test("dedup/similarity operators return empty on empty input") {
    assert(Dedup.minhashPairs(emptyDocs, "text", "doc_id", 0.9).count() == 0)
    assert(Dedup.jaccardJoin(emptyDocs, "text", "doc_id", 0.8).count() == 0)
    assert(Dedup.simhashPairs(emptyDocs, "text", "doc_id", 3).count() == 0)
    assert(graft.similarity.StringSim.similarPairs(
      emptyDocs.toDF("id", "s"), "s", "id", 0.5).count() == 0)
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(graft.dedup.Components.connectedComponents(noPairs, "id_a", "id_b").count() == 0)
    // no pairs => nothing to collapse, the corpus passes through whole
    assert(graft.dedup.Components.dedupByPairs(
      Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text"), "doc_id",
      noPairs, "id_a", "id_b").count() == 2)
    assert(Dedup.contaminatedIds(emptyDocs, "text", "doc_id",
      emptyDocs, "text", 3).count() == 0)
    assert(graft.text.TextAnalysis.repetitionMetrics(emptyDocs, "text", "doc_id").count() == 0)
    assert(graft.pipeline.Pipeline.stratifiedSampleByHash(
      emptyDocs, col("doc_id"), col("text"), Map("x" -> 0.5)).count() == 0)
    assert(graft.pipeline.Pipeline.packSequences(
      emptyDocs.withColumn("tok", lit(1)), col("doc_id"), col("tok"), 512).count() == 0)
  }

  test("a single document yields no pairs and a full profile row") {
    val one = Seq((1L, "just one document here")).toDF("doc_id", "text")
    assert(Dedup.minhashPairs(one, "text", "doc_id", 0.5).count() == 0)
    assert(TextAnalysis.profile(one, "text", "doc_id").count() == 1)
  }

  test("profiler handles empty tables and all-null columns") {
    val empty = Seq.empty[(Long, Option[Double])].toDF("id", "v")
    assert(Profiler.summary(empty).collect()(0).getLong(0) == 0)
    assert(Profiler.frequencyTable(empty, "v").count() == 0)
    val stats = Profiler.numericStats(empty, Seq("v")).collect()
    assert(stats.length == 1 && stats(0).isNullAt(stats(0).fieldIndex("mean")))

    val allNull = (1 to 50).map(i => (i.toLong, Option.empty[Double])).toDF("id", "v")
    val s = Profiler.numericStats(allNull, Seq("v")).collect()(0)
    assert(s.getAs[Long]("cnt") == 0 && s.isNullAt(s.fieldIndex("median")))
    val np = Profiler.nullProfile(allNull).filter(col("column") === "v").collect()(0)
    assert(np.getAs[Long]("null_count") == 50 && np.getAs[Double]("fill_pct") == 0.0)
  }

  test("detector and rules on empty / all-null input") {
    val allNull = (1 to 20).map(i => (i.toLong, Option.empty[Double])).toDF("id", "v")
    val rep = Detector.dqReport(allNull, "v", Seq(Rule.NumBetween(0, 1))).collect()(0)
    assert(rep.getAs[Long]("null_records") == 20 && rep.getAs[Double]("dq_score") == 0.0)
    assert(rep.getAs[String]("dq_band") == "VERY LOW")
    val empty = Seq.empty[(Long, Option[Double])].toDF("id", "v")
    assert(Detector.duplicateRows(empty).count() == 0)
    assert(Detector.uselessRows(empty).count() == 0)
  }

  test("ann operators on empty corpora") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val q = Array.fill(4)(1.0)
    assert(Ann.cosineTopK(empty, "embedding", "vec_id", q, 5).count() == 0)
    assert(Ann.cosinePairs(empty, "embedding", "vec_id", 0.9, dim = 4).count() == 0)
    assert(Ann.cosinePairsExact(empty, empty, "embedding", "vec_id", 0.9).count() == 0)
  }

  test("pipeline split/sample/redact on empty and whitespace-only text") {
    val empty = Seq.empty[(Long, String)].toDF("id", "text")
    assert(Pipeline.withSplit(empty, "text").count() == 0)
    assert(Pipeline.sampleByHash(empty, col("id"), 0.5).count() == 0)
    val ws = Seq((1L, "   "), (2L, "")).toDF("id", "text")
    val r = Pipeline.withSplit(ws, "text").select("split").collect().map(_.getString(0))
    assert(r.forall(Set("train", "val", "test")))
    val wc = ws.select(TextAnalysis.wordCount(col("text")).as("c")).collect().map(_.getInt(0))
    assert(wc.toSeq == Seq(0, 0))
  }

  test("r4 operators return empty/neutral results on empty input") {
    val emptyEmb = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(graft.text.Boilerplate.stripBoilerplate(emptyDocs, "text", "doc_id", 2).count() == 0)
    assert(graft.text.Boilerplate.lineDocFreq(emptyDocs, "text", "doc_id").count() == 0)
    val emptyLm = graft.text.TokenStats.unigramCounts(emptyDocs, "text", "doc_id")
    assert(graft.text.TokenStats.crossEntropy(emptyDocs, "text", "doc_id", emptyLm).count() == 0)
    assert(graft.text.TokenStats.topVocab(emptyLm, 5).count() == 0)
    // empty vocabulary: every token is OOV, rate 1.0
    val oov = graft.text.TokenStats.oovRate(
      Seq((1L, "a b")).toDF("doc_id", "text"), "text", "doc_id",
      graft.text.TokenStats.topVocab(emptyLm, 5)).collect()(0)
    assert(oov.getLong(2) == 2L && oov.getDouble(3) == 1.0)
    val cents = Array(Array(1.0, 0.0))
    assert(Ann.assignClusters(emptyEmb, "embedding", "vec_id", cents).count() == 0)
    assert(Ann.semanticPairs(emptyEmb, "embedding", "vec_id", cents, 0.9).count() == 0)
    assert(Ann.semanticDedup(emptyEmb, "embedding", "vec_id", cents, 0.9).count() == 0)
    assert(Dedup.nearDupMatches(emptyDocs, emptyDocs, "text", "doc_id", 0.7).count() == 0)
    // empty STORE: the whole batch survives
    assert(Dedup.dedupNearAgainstStore(Seq((1L, "a b")).toDF("doc_id", "text"),
      emptyDocs, "text", "doc_id", 0.7).count() == 1)
    assert(graft.text.TextAnalysis.qualityFilterReport(emptyDocs, "text", "doc_id").count() == 0)
    assert(graft.text.TextAnalysis.seqLenHistogram(emptyDocs, "text").count() == 0)
    assert(Pipeline.epochShuffle(emptyDocs, col("doc_id"), "e").count() == 0)
  }

  test("r4 operators tolerate null text values") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType, nullable = true)))
    val docs = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, null),
        org.apache.spark.sql.Row(2L, "real content here")), schema)
    // null text docs come back (empty after strip), never crash
    val stripped = graft.text.Boilerplate.stripBoilerplate(docs, "text", "doc_id", 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(stripped(1L) == "" && stripped(2L) == "real content here")
    // null text = zero tokens -> too_short, not an exception
    val rep = graft.text.TextAnalysis.qualityFilterReport(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(rep(1L) == "too_short" && rep.size == 2)
    val lm = graft.text.TokenStats.unigramCounts(docs, "text", "doc_id")
    assert(graft.text.TokenStats.crossEntropy(docs, "text", "doc_id", lm).count() == 1)
    assert(graft.dedup.Dedup.dedupNearAgainstStore(
      docs, docs.filter("doc_id = 2"), "text", "doc_id", 0.7).collect()
      .map(_.getLong(0)).toSet == Set(1L)) // null-text survives, dup drops
  }
}
