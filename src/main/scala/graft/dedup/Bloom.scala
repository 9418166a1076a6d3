package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter ingest guard — the approximate fast path in front of
  * D19's exact incremental dedup: a new batch is screened against a
  * compact bit-array summary of the accumulated store instead of
  * shuffling the batch against the full store. Bloom filters have NO
  * false negatives, so every unflagged row is DEFINITELY novel and
  * skips the exact join entirely; only the flagged sliver (true dups
  * + the fpp share of false positives) needs the exact anti-join.
  * At 100 TB: the store's summary is megabytes (broadcast once per
  * batch) versus a store-sized shuffle per batch — the same
  * bits-for-shuffle trade Spark's own runtime row-filtering makes.
  *
  * The filter rides in ONE codegen reference object
  * ([[graft.functions.BloomContains]]), so screening is MAP-ONLY.
  */
object Bloom {

  /** Build the store's content filter: serialized Bloom bits over
    * `keyCol` (cast to string; hash content keys — e.g. `md5(text)` —
    * not raw documents). `expectedItems` sizes the bits
    * (n·ln(1/fpp)/ln²2 ≈ 1.2 MB per 1M keys at 1% — a documented
    * dimension, not a corpus); overfilling degrades fpp, never
    * correctness. Built distributed (per-partition filters OR-merged);
    * only the final bits reach the driver.
    */
  def buildFilter(store: DataFrame, keyCol: Column, expectedItems: Long,
                  fpp: Double = 0.01): Array[Byte] = {
    require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val f = store.stat.bloomFilter(keyCol.cast("string"), expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    f.writeTo(bos)
    bos.toByteArray
  }

  /** Membership test column against serialized filter bits — true
    * means "possibly in the store", false means "definitely novel".
    */
  def mightContain(key: Column, filterBytes: Array[Byte]): Column =
    graft.functions.BloomContains(key.cast("string"), filterBytes)

  /** Screen a batch: adds `bloom_hit` (map-only scan). Rows with
    * `bloom_hit = false` are guaranteed novel; route only the rest to
    * [[Dedup.dedupAgainstStore]]-style exact checks.
    */
  def screenBatch(batch: DataFrame, keyCol: Column,
                  filterBytes: Array[Byte]): DataFrame =
    batch.withColumn("bloom_hit", mightContain(keyCol, filterBytes))
}
