package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** D91: perceptual image dedup via difference hashing (dHash — the
  * gradient-sign perceptual hash the image-dedup ecosystem
  * standardized on): decode → bilinear resample to a 9×8 luminance
  * grid (REAL [[Multimodal.ImageCodec]] arithmetic, not a stub) →
  * one bit per horizontal neighbor pair (left > right) → a 64-bit
  * hash that survives re-encoding, rescaling, and mild
  * color/brightness shifts — exactly the transformations that break
  * byte-exact (D1) dedup on crawled images. The histogram-feature
  * LSH of q_e2e_media finds LOOK-ALIKE images; dHash certifies
  * derived COPIES with a discrete, oracle-pinnable distance.
  *
  * Scale shape: hashing is MAP-ONLY (bounded decode work per
  * payload, 8 bytes out per image — the media bytes never shuffle);
  * matching reuses the generalized-pigeonhole band join
  * ([[graft.dedup.Dedup.hammingBandPairs]], the D3 machinery):
  * recall-complete candidate buckets, exact `bit_count(xor)`
  * verify, never all-pairs.
  *
  * Determinism: grid resample and thresholding are fixed-order
  * double arithmetic on decoded ARGB pixels; PNG decode is
  * lossless, so fixture hashes pin as literal VALUES (the d13b
  * scheme). Strict inequality (left > right) makes flat regions
  * all-zero bits — stable under uniform brightness shifts.
  */
object ImageHash {

  /** 64-bit dHash; None when the payload does not decode. */
  def dHash(bytes: Array[Byte]): Option[Long] = {
    val img = Multimodal.ImageCodec.decode(bytes)
    if (img == null) return None
    val grid = Multimodal.ImageCodec.luminanceGrid(img, 9, 8)
    var h = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (grid(y * 9 + x) > grid(y * 9 + x + 1))
          h |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    Some(h)
  }

  /** Map-only hash extraction: (idCol, contentCol) → (id, dhash).
    * Undecodable payloads are EXCLUDED (no hash — the codec
    * family's empty-features contract). */
  def dHashes(df: DataFrame, idCol: String, contentCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        dHash(if (bytes == null) Array.empty else bytes).map(h => (id, h))
      }
      .toDF("id", "dhash")
  }

  /** Near-duplicate image pairs within `maxHamming` bits:
    * (id_a, id_b, hamming), id_a < id_b. Banded candidate join +
    * exact verify — see [[graft.dedup.Dedup.hammingBandPairs]] for
    * the `chunks` bucket-space dial. */
  def nearDupPairs(hashes: DataFrame, maxHamming: Int = 6,
                   chunks: Int = 8): DataFrame =
    graft.dedup.Dedup.hammingBandPairs(
      hashes.select(col("id"), col("dhash").as("sh")), 64, maxHamming, chunks)
}
