package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** D88: audio near-duplicate detection via constellation-landmark
  * fingerprints (the Shazam scheme, Wang 2003, reduced to its
  * deterministic core): STFT → per-band spectral peaks → landmark
  * hashes pairing each peak with peaks in the next few frames →
  * an inverted index on hash → time-offset-aligned match counting.
  * The reference has no audio surface at all (its media handling
  * stops at pandas CSV); this extends the D13 real-WAV codec into
  * the dedup family: re-encoded, time-shifted, or truncated copies
  * of the same recording share landmark hashes at a CONSISTENT
  * frame offset, which pure spectral-profile features (q_d13c's
  * 12-float vector) cannot certify.
  *
  * Determinism: decode, FFT, peak picking and hashing are all
  * fixed-order double arithmetic on the decoded samples — the same
  * payload always yields the same hash set (same caveat as the d13
  * gates: bit-stability across JVMs holds to FFT ulp behavior, and
  * the gate pins DISCRETE hashes with peaks well clear of the
  * threshold).
  *
  * Scale shape (100 TB of audio): fingerprinting is MAP-ONLY — one
  * pass over payloads, bounded work per payload (`maxFrames` cap),
  * output ~tens of landmark rows per second of audio, orders of
  * magnitude smaller than the media bytes. Matching is the D2/D4
  * inverted-index shape: group landmarks by hash, df-cap the
  * degenerate hashes (click tracks, silence transitions — the
  * df-cap is the same quadratic-blowup guard as D4's), then a
  * hash-equijoin (shuffle on hash, never all-pairs) and a count per
  * (pair, Δframe). A batch-vs-store variant falls out of the same
  * index: materialize `fingerprints` of the store once, equijoin
  * the batch side (the D34b pattern).
  */
object AudioFingerprint {

  /** STFT geometry: 1024-sample frames, 512 hop. */
  val FrameSize = 1024
  val Hop = 512
  /** Per-frame peak bands over FFT bins [1, 512): log-spaced. */
  private val BandEdges = Array(1, 8, 16, 32, 64, 128, 512)
  /** A band peak must be within 20 dB of the frame's max bin. */
  private val PeakFloor = 0.01
  /** Landmark fan-out: pair each peak with peaks 1..3 frames ahead. */
  val FanFrames = 3

  /** Landmark hashes for one payload: (hash, frame) pairs, where
    * hash packs (f1 << 12) | (f2 << 3) | dt — two 9-bit peak bins
    * and a 3-bit frame delta. Undecodable payloads yield an empty
    * array (the codec family's contract). Work is bounded by
    * `maxFrames` regardless of payload length.
    */
  def landmarks(bytes: Array[Byte], maxFrames: Int = 2048): Array[(Int, Int)] = {
    val decoded = Multimodal.AudioCodec.decodePcm(bytes)
    if (decoded == null) return Array.empty
    val (samples, _) = decoded
    val nFrames = math.min(
      math.max((samples.length - FrameSize) / Hop + 1, 0), maxFrames)
    if (nFrames <= 0) return Array.empty
    // per-frame peak bins
    val peaks = new Array[Array[Int]](nFrames)
    val frame = new Array[Double](FrameSize)
    var t = 0
    while (t < nFrames) {
      java.util.Arrays.fill(frame, 0.0)
      System.arraycopy(samples, t * Hop, frame, 0,
        math.min(FrameSize, samples.length - t * Hop))
      val mag2 = Multimodal.AudioCodec.fftMag2(frame, FrameSize)
      var fmax = 0.0
      var k = 1
      while (k < FrameSize / 2) { if (mag2(k) > fmax) fmax = mag2(k); k += 1 }
      val ps = Array.newBuilder[Int]
      if (fmax > 1e-12) {
        var b = 0
        while (b < BandEdges.length - 1) {
          var best = -1
          var bestV = 0.0
          k = BandEdges(b)
          while (k < BandEdges(b + 1)) {
            if (mag2(k) > bestV) { bestV = mag2(k); best = k }
            k += 1
          }
          if (best >= 0 && bestV >= PeakFloor * fmax) ps += best
          b += 1
        }
      }
      peaks(t) = ps.result()
      t += 1
    }
    // landmarks: each peak paired with every peak 1..FanFrames ahead
    val out = Array.newBuilder[(Int, Int)]
    t = 0
    while (t < nFrames) {
      for (f1 <- peaks(t); dt <- 1 to FanFrames if t + dt < nFrames;
           f2 <- peaks(t + dt))
        out += (((f1 << 12) | (f2 << 3) | dt, t))
      t += 1
    }
    out.result()
  }

  /** Map-only fingerprint extraction: `(idCol, contentCol)` →
    * `(id, hash, t)`, one row per landmark. */
  def fingerprints(df: DataFrame, idCol: String, contentCol: String,
                   maxFrames: Int = 2048): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        landmarks(if (bytes == null) Array.empty else bytes, maxFrames)
          .map { case (h, t) => (id, h, t) }
      }
      .toDF("id", "hash", "t")
  }

  /** Time-aligned match pairs from a landmark frame: hashes shared
    * by two payloads vote for the frame offset `dt = t_b - t_a`;
    * a pair whose best offset collects ≥ `minAligned` votes is a
    * (near-)duplicate, reported with that offset. `maxDf` drops
    * hashes present in more than that many payloads BEFORE the
    * self-join (the D4 df-cap — a ubiquitous hash contributes
    * df² join rows and no identification power).
    *
    * Returns (id_a, id_b, aligned, frame_offset), id_a < id_b,
    * best offset per pair (ties: smallest |offset|, then smallest
    * offset).
    */
  def matchPairs(fp: DataFrame, minAligned: Int = 5,
                 maxDf: Int = 1000): DataFrame = {
    val kept = fp.join(
      fp.groupBy("hash").agg(countDistinct("id").as("_df"))
        .filter(col("_df") <= maxDf).select("hash"),
      Seq("hash"))
    val a = kept.select(col("hash"), col("id").as("id_a"), col("t").as("t_a"))
    val b = kept.select(col("hash"), col("id").as("id_b"), col("t").as("t_b"))
    val votes = a.join(b, Seq("hash"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"), (col("t_b") - col("t_a")).as("frame_offset"))
      .agg(count(lit(1)).as("aligned"))
    val w = Window.partitionBy("id_a", "id_b")
      .orderBy(col("aligned").desc, abs(col("frame_offset")).asc,
        col("frame_offset").asc)
    votes.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1 && col("aligned") >= minAligned)
      .select("id_a", "id_b", "aligned", "frame_offset")
  }
}
