package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** fastText-style linear quality-classifier INFERENCE (Joulin et al.
  * 2017, the model family behind CCNet's quality scores and
  * FineWeb-Edu-style classifier filtering): a document's score is the
  * sigmoid of the mean weight of its hashed n-gram features plus a
  * bias. Training happens offline (single-node, tiny model); what a
  * 100 TB pipeline needs from the engine is cheap, deterministic,
  * distributed INFERENCE — which is a map-only feature explode, one
  * broadcast join against the bounded weight table, and one per-doc
  * aggregation. No UDFs, no model object on the executors beyond the
  * broadcast dimension.
  *
  * Features are [[graft.pipeline.Dsir.hashedFeatures]] (hashed
  * unigram+bigram bag, portable md5 bucketing with the same xxhash64
  * production knob). Weights are MICRO-quantized longs, so the
  * per-doc dot product is an exact integer sum —
  * reduction-order-independent, the repo-wide float discipline.
  */
object Classifier {

  /** Deterministic pseudo-weight table for specs and correctness
    * gates: (bucket, w_micro) with w_micro the md5-head of
    * "seed:bucket" mapped into [−1e6, 1e6] micro-units ([−1, 1]
    * nats). A stand-in for a trained model with the same shape — a
    * REAL model is supplied as any (bucket, w_micro) DataFrame (the
    * external-dimension contract, like
    * [[graft.corrector.Enrich.genderFromTable]]).
    */
  def hashWeights(spark: SparkSession, buckets: Int,
                  seed: String = "qw"): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    spark.range(buckets.toLong).select(
      col("id").cast("long").as("bucket"),
      (conv(substring(md5(concat(lit(seed), lit(":"), col("id").cast("string"))),
        1, 8), 16, 10).cast("long") % 2000001L - 1000000L).as("w_micro"))
  }

  /** Per-document linear classifier score: (id, feat_count,
    * dot_micro, logit_micro, logit, prob, label) with
    * logit = Σ_f w[bucket(f)]/n_feats + bias, prob = σ(logit),
    * label = 1 iff prob ≥ threshold. `weights` is a bounded
    * (bucket, w_micro) table — broadcast; buckets absent from it
    * weigh 0 (a sparse trained model is fine). dot_micro is the
    * exact integer dot product; the mean logit quantizes to an
    * integer micro value first and the 4-dp display value derives by
    * integer-space rounding (the repo's tie-safe policy — ties land
    * on exactly-representable .5); prob is computed FROM the rounded
    * logit so both engines see an identical double input to exp.
    */
  def linearScore(df: DataFrame, textCol: String, idCol: String,
                  weights: DataFrame, buckets: Int = 10000,
                  biasMicro: Long = 0L, threshold: Double = 0.5,
                  portableHash: Boolean = true): DataFrame = {
    val feats = graft.pipeline.Dsir.hashedFeatures(
      df, textCol, idCol, buckets, portableHash)
    val scored = feats
      .join(broadcast(weights.select(col("bucket"),
        col("w_micro").cast("long").as("w_micro"))), Seq("bucket"), "left")
      .groupBy(col(idCol))
      .agg(sum(col("cnt")).as("feat_count"),
        sum(col("cnt") * coalesce(col("w_micro"), lit(0L))).as("dot_micro"))
      .withColumn("logit_micro",
        round(col("dot_micro") / col("feat_count") + biasMicro).cast("long"))
      .withColumn("logit",
        round(col("logit_micro") / 100.0).cast("long") / 10000.0)
      .withColumn("prob", round(lit(1.0) / (lit(1.0) + exp(-col("logit"))), 4))
      .withColumn("label", when(col("prob") >= threshold, 1).otherwise(0))
    scored
  }
}
