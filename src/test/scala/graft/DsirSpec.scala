package graft

import graft.pipeline.Dsir
import org.apache.spark.sql.functions._

/** D46 DSIR importance resampling: feature arithmetic, target-
  * affinity ordering, determinism, and the Gumbel top-k contract.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val targetLike = Seq(
    (1L, "aa bb aa bb aa"),
    (2L, "bb aa bb aa bb")
  )
  private val junk = Seq(
    (3L, "zz yy zz yy zz"),
    (4L, "yy zz yy zz yy")
  )

  test("feat_count is tokens + bigrams per document") {
    val raw = (targetLike ++ junk).toDF("doc_id", "text")
    val w = Dsir.importanceWeights(raw, targetLike.toDF("doc_id", "text"),
      "text", "doc_id").orderBy("doc_id").collect()
    // 5 tokens + 4 bigrams = 9 features per doc
    assert(w.map(_.getAs[Long]("feat_count")).toSeq == Seq(9L, 9L, 9L, 9L))
  }

  test("documents resembling the target outscore documents that don't") {
    val raw = (targetLike ++ junk).toDF("doc_id", "text")
    val w = Dsir.importanceWeights(raw, targetLike.toDF("doc_id", "text"),
      "text", "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("log_ratio")).toMap
    assert(math.min(w(1L), w(2L)) > math.max(w(3L), w(4L)),
      s"target-like docs must outscore junk: $w")
  }

  test("weights are partitioning-invariant (exact integer sums)") {
    val raw = (targetLike ++ junk).toDF("doc_id", "text")
    val tgt = targetLike.toDF("doc_id", "text")
    val a = Dsir.importanceWeights(raw, tgt, "text", "doc_id")
      .orderBy("doc_id").collect().toSeq
    val b = Dsir.importanceWeights(raw.repartition(7), tgt.repartition(3),
      "text", "doc_id").orderBy("doc_id").collect().toSeq
    assert(a.map(_.toSeq) == b.map(_.toSeq))
  }

  test("hashed buckets stay inside [0, buckets)") {
    val raw = (targetLike ++ junk).toDF("doc_id", "text")
    val f = Dsir.hashedFeatures(raw, "text", "doc_id", buckets = 17)
      .agg(min("bucket"), max("bucket")).collect()(0)
    assert(f.getLong(0) >= 0L && f.getLong(1) < 17L)
  }

  test("resampleTopK is deterministic, seed-sensitive, and k-bounded") {
    val raw = (1L to 40L).map(i => (i, s"w$i x$i y$i")).toDF("doc_id", "text")
    val tgt = raw.filter(col("doc_id") <= 10)
    val w = Dsir.importanceWeights(raw, tgt, "text", "doc_id")
    val s1 = Dsir.resampleTopK(w, "doc_id", k = 5).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    val s2 = Dsir.resampleTopK(w, "doc_id", k = 5).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(s1 == s2, "same seed must reproduce the same sample")
    assert(s1.size == 5)
    val k1 = Dsir.resampleTopK(w, "doc_id", k = 40, seed = "a")
      .select("doc_id", "gumbel_key").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val k2 = Dsir.resampleTopK(w, "doc_id", k = 40, seed = "b")
      .select("doc_id", "gumbel_key").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(k1.keySet == k2.keySet && k1 != k2,
      "a different seed must redraw the Gumbel keys")
  }

  test("k past the corpus size returns every row") {
    val raw = (targetLike ++ junk).toDF("doc_id", "text")
    val w = Dsir.importanceWeights(raw, targetLike.toDF("doc_id", "text"),
      "text", "doc_id")
    assert(Dsir.resampleTopK(w, "doc_id", k = 100).count() == 4)
  }
}
