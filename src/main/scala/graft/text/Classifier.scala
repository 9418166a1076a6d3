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
      // prob = σ(logit) with exp's OUTPUT quantized to the 1e-6 grid
      // before the division. The only cross-engine-nondeterministic
      // step in a sigmoid is the libm exp call (last-ulp drift across
      // builds — the r10 driver failure); float division/rounding of
      // identical inputs is IEEE-exact in every engine. Quantizing σ
      // itself would NOT work: 4-dp logits near 0 put σ·1e4 on
      // quarter-steps (σ ≈ ½ + logit/4), parking documents ~1e-9
      // from a rounding boundary STRUCTURALLY (observed at sf0.01).
      // exp outputs carry no such rational structure, so e·1e6 sits a
      // generic distance from its boundary — which
      // [[sigmoidBoundaryGuard]] certifies. |logit| > 20 saturates to
      // exact 0/1 (σ(20) is 1 − 2e-9, invisible at 4 dp) — keeps
      // e·1e6 within int64 for any real model's logit range.
      .withColumn("prob",
        when(col("logit") > 20.0, lit(1.0))
          .when(col("logit") < -20.0, lit(0.0))
          .otherwise(round(lit(10000.0)
            / (lit(1.0) + round(exp(-col("logit")) * 1e6).cast("long") / lit(1e6)))
            .cast("long") / 10000.0))
      .withColumn("label", when(col("prob") >= threshold, 1).otherwise(0))
    scored
  }

  /** ONE-ROW cross-engine portability guard over a [[linearScore]]
    * frame: `min_sigmoid_dist` = the minimum over unsaturated
    * documents of the distance of the pre-round exp(−logit)·1e6
    * double from its quantization boundary. Libm exp drift across
    * engines/builds is ≲1e-9 on this grid, so
    * `min_sigmoid_dist > 1e-7` certifies any engine recomputing
    * exp from the SAME 4-dp logit rounds to the identical quantized
    * e — after which prob/label follow by IEEE-deterministic
    * division alone. A pure function of the scored frame's `logit`
    * column, so no classifier internals are re-derived.
    */
  def sigmoidBoundaryGuard(scored: DataFrame): DataFrame = {
    val x = exp(-col("logit")) * 1e6
    scored.filter(abs(col("logit")) <= 20.0)
      .select(abs(x - floor(x) - lit(0.5)).as("_d"))
      .agg(min(col("_d")).as("min_sigmoid_dist"))
  }
}
