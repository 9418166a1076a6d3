package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-document tf-idf keyword extraction — the standard salient-term
  * signal behind corpus topic maps, dataset-card term clouds, and
  * cheap doc-level routing (which domain mixture does this doc belong
  * to). Not in the reference (dataqtor profiles VALUES, not text);
  * part of the LLM-pipeline extension set, SURVEY §2 D.
  *
  * Spark-first shape, corpus-linear end to end:
  *  - tf: ONE map-side-combined (doc, token) groupBy over the token
  *    explode (the only corpus-sized shuffle);
  *  - document frequency df and the doc count N both derive from that
  *    SAME tf frame (df = per-token row count because tf is distinct
  *    per (doc, token); N rides as a broadcast one-row aggregate — no
  *    driver count action, no second scan of the corpus);
  *  - idf joins back on the token key (AQE broadcasts it when the
  *    vocabulary is bounded; a shuffle join otherwise — never
  *    pairwise);
  *  - top-k per doc is a rank window PARTITIONED BY DOC — parallel
  *    across the corpus, no global sort (the D38 pattern).
  *
  * Float discipline (repo-wide, the r10/r11 lesson): idf = ln((N+1)/
  * (df+1)) is the one libm call. It quantizes to MICRO-nats (long)
  * carrying a boundary-distance column, so every per-doc score
  * tf·idf_micro is an exact integer product and the rank order is
  * bit-stable across partitionings and engines; gate queries pin
  * `min_idf_dist > 1e-7` as a guard row (cross-build libm drift
  * ≲ 1e-8 micro), certifying any engine recomputing the idf table
  * rounds to identical integers — the [[graft.pipeline.Dsir]] scheme.
  */
object Keywords {

  /** Top-`k` tf-idf keywords per document:
    * (id, token, tf, score) with score = tf·idf in nats at 4 dp
    * (rounded in integer micro space). Ties on score break on token
    * ascending — a total order, so the kept set is deterministic.
    */
  def tfIdfKeywords(df: DataFrame, textCol: String, idCol: String,
                    k: Int = 5): DataFrame =
    tfIdfKeywordsAndGuard(df, textCol, idCol, k)._1

  /** [[tfIdfKeywords]] plus the ONE-ROW idf boundary guard
    * (`min_idf_dist`): minimum distance of any token's pre-round
    * idf·1e6 double from its .5 rounding boundary. `> 1e-7` certifies
    * the integer idf table is engine-portable (see object doc).
    */
  def tfIdfKeywordsAndGuard(df: DataFrame, textCol: String, idCol: String,
                            k: Int = 5): (DataFrame, DataFrame) = {
    require(k > 0, s"k must be positive, got $k")
    // persisted: tf feeds BOTH the df_t rollup and the scoring join —
    // without the pin the tokenize+explode+groupBy runs twice (the
    // duplicatedSpanStats lesson, SURVEY r11)
    val tf = graft.CacheScope.persist(df
      .select(col(idCol), explode(split(trim(col(textCol)), " +")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf")))
    // tf is distinct per (doc, token), so df_t is a plain row count;
    // bounded by the vocabulary, not the corpus
    val dft = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("_n"))
    val idfMicroDbl =
      log((col("_n") + 1L).cast("double") / (col("df") + 1L).cast("double")) * 1e6
    val idf = graft.CacheScope.persist(
      dft.crossJoin(broadcast(n)).select(
        col("token"),
        round(idfMicroDbl).cast("long").as("idf_micro"),
        abs(idfMicroDbl - floor(idfMicroDbl) - lit(0.5)).as("_bd")))
    // empty corpus → vacuously safe (0.5 = max possible distance)
    val guard = idf.agg(
      coalesce(min(col("_bd")), lit(0.5)).as("min_idf_dist"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score_micro").desc, col("token").asc)
    val kw = tf.join(idf.select(col("token"), col("idf_micro")), Seq("token"))
      .withColumn("score_micro", col("tf") * col("idf_micro"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      // 4-dp display from the integer micro value (ties on exactly-
      // representable .5 — the repo-wide tie-safe rounding)
      .select(col(idCol), col("token"), col("tf"),
        (round(col("score_micro") / 100.0).cast("long") / 10000.0).as("score"))
    (kw, guard)
  }
}
