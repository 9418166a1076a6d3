package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for heavy-hitter keys.
  *
  * A plain `groupBy(key).agg(...)` sends every row of a hot key to one
  * reducer. Salting splits each key into `buckets` sub-keys for a
  * first partial aggregation, then combines partials in a second,
  * tiny aggregation — the classic two-stage shape (AQE's skew handling
  * covers joins; aggregation salting is still manual).
  */
object Skew {

  /** Salt in [0, buckets) that varies per row INDEPENDENT of row
    * content: a hot key is, archetypally, many identical rows, so a
    * content hash would assign them all one salt and the mitigation
    * would silently be a no-op. `monotonically_increasing_id` is
    * (partitionId << 33) + row offset — distinct per row and uniform
    * mod `buckets` within a partition. Task retries / AQE replans may
    * observe a different intra-partition row order and thus different
    * salt values, but that is harmless: the salt only routes rows to
    * partial aggregates, and every [0, buckets) assignment produces
    * the same combined result.
    */
  def salt(buckets: Int): Column =
    pmod(monotonically_increasing_id(), lit(buckets.toLong))

  /** Salted distributive count: two-stage count by key. Result is
    * identical to `groupBy(key).count()`; the first stage fans the
    * hot key across `buckets` reducers.
    */
  def saltedCount(df: DataFrame, key: String, buckets: Int): DataFrame =
    df.withColumn("_salt", salt(buckets))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as("cnt"))

  /** Salted distributive sum by key (same two-stage shape). */
  def saltedSum(df: DataFrame, key: String, valueCol: String, buckets: Int): DataFrame =
    df.withColumn("_salt", salt(buckets))
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as(s"sum_$valueCol"))

  /** Skew-proof inner equi-join: the classic replicate-and-salt shape
    * for when a sort-merge join's hot key floods one task and the
    * small side is too big to broadcast outright. Each `left` row
    * gets one salt; `right` is replicated once per salt value (x
    * `buckets` — right should be the SMALLER side); the join key
    * becomes (key, salt), so a hot key's rows spread over `buckets`
    * tasks. Result is exactly `left.join(right, key)`. (AQE's skew
    * handling splits oversized sort-merge partitions at runtime and
    * is the first resort; this is the explicit fallback when AQE
    * cannot help — e.g. a single key bigger than memory, or a
    * non-sort-merge plan.)
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 buckets: Int): DataFrame = {
    val salted = left.withColumn("_salt", salt(buckets))
    val replicated = right.withColumn("_salt",
      explode(array((0 until buckets).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
