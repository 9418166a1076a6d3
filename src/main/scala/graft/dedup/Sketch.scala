package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bottom-k (KMV) corpus sketches: estimate the content overlap of
  * two corpora WITHOUT a full intersection join — the
  * "how much of crawl B is already in training set A" question asked
  * before committing to an expensive dedup pass. Beyer et al.,
  * "On Synopses for Distinct-Value Estimation Under Multiset
  * Operations" (SIGMOD 2007): the k smallest hash values of a set
  * are a mergeable synopsis; the k-th smallest value estimates
  * distinct cardinality ((k−1)/U_(k)), and the fraction of the
  * union's bottom-k that lies in A∩B estimates the Jaccard
  * similarity.
  *
  * Everything is deterministic (content hash, no RNG), so the sketch
  * is reproducible across runs, partitionings, and engines — the
  * estimate itself is oracle-checkable. Plan shape: one distinct per
  * corpus (map-side combined), a hash-keyed membership merge, and a
  * TakeOrdered bottom-k (per-partition heads, never a global sort);
  * only k rows leave the aggregation.
  */
object Sketch {

  /** 60-bit content hash as a FIXED-WIDTH hex string (15 md5
    * nibbles): lexicographic order = numeric order, so the bottom-k
    * is a plain string sort and the same derivation re-runs in any
    * SQL engine ([[Spans]] uses the identical fingerprint family).
    * Normalization: lower + collapsed whitespace, the
    * [[graft.text.TextAnalysis.fingerprint]] contract.
    */
  def contentHashHex(c: Column): Column =
    substring(md5(regexp_replace(lower(trim(c)), "\\s+", " ")), 1, 15)

  /** KMV overlap estimate of corpora `a` and `b`: ONE summary row
    * (k, k_used, inter_cnt, j_est, union_est[, j_exact,
    * union_exact]) where j_est = |bottom-k(A∪B) ∩ A∩B| / k_used and
    * union_est = (k_used−1)/U_(k) with U_(k) the k-th smallest hash
    * mapped into (0,1] over the 16^15 hash space. k_used < k iff the
    * union has fewer than k distinct contents (then the sketch IS
    * the union and j_est/union_est are exact by construction).
    *
    * When k_used < k the sketch saw the ENTIRE union, so j_est is the
    * exact Jaccard and union_est reports k_used itself (the (k−1)/U_(k)
    * estimator is only for the truncated case — applied to a complete
    * set it would be biased low by one element and by hash luck).
    *
    * `withExact = true` additionally computes the exact Jaccard and
    * union cardinality from the merged membership frame (one extra
    * full aggregation — the gate/diagnostic flavor; production
    * default false keeps the whole result k-bounded).
    */
  def corpusJaccardKmv(a: DataFrame, b: DataFrame, textCol: String,
                       k: Int = 1024, withExact: Boolean = false): DataFrame = {
    require(k > 1, s"k must be > 1, got $k")
    def side(df: DataFrame, flag: String) =
      df.select(contentHashHex(col(textCol)).as("h")).distinct()
        .withColumn(flag, lit(1))
    val merged0 = side(a, "in_a").join(side(b, "in_b"), Seq("h"), "full_outer")
      .select(col("h"), coalesce(col("in_a"), lit(0)).as("in_a"),
        coalesce(col("in_b"), lit(0)).as("in_b"))
    val merged = if (withExact) graft.CacheScope.persist(merged0) else merged0
    val bottom = merged.orderBy(col("h").asc).limit(k)
    // 16^15 = 2^60; (k−1)·2^60 is exact in a double (tiny mantissa)
    // and the hash value converts identically in any engine, so the
    // division — and therefore the rounded estimate — is bit-stable
    val est = bottom.agg(
        count(lit(1)).as("k_used"),
        sum(col("in_a") * col("in_b")).as("inter_cnt"),
        max(conv(col("h"), 16, 10).cast("long")).as("_vk"))
      .select(lit(k).as("k"), col("k_used"), col("inter_cnt"),
        (round(col("inter_cnt") * 10000.0 / col("k_used")).cast("long") / 10000.0)
          .as("j_est"),
        when(col("k_used") < k, col("k_used"))
          .otherwise(round((col("k_used") - 1).cast("double")
            * 1152921504606846976.0 / col("_vk")).cast("long")).as("union_est"))
    if (!withExact) est
    else {
      val exact = merged.agg(
          count(lit(1)).as("union_exact"),
          sum(col("in_a") * col("in_b")).as("_ix"))
        .select(col("union_exact"),
          (round(col("_ix") * 10000.0 / col("union_exact")).cast("long") / 10000.0)
            .as("j_exact"))
      est.crossJoin(broadcast(exact))
    }
  }
}
