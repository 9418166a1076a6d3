package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** D98: int8 embedding quantization — the 4× storage/bandwidth
  * compression every production embedding store runs before ANN
  * serving (float32 → symmetric per-vector int8, the FAISS
  * `SQ8`/ScaNN scheme): q_i = round(x_i / m · 127) with m = max|x_i|
  * per vector. At 100 TB of embeddings the win IS the job: a quarter
  * of the scan bytes, integer SIMD dot products, and the PQ family
  * (D36) composes downstream for deeper compression.
  *
  * Why cosine survives quantization untouched: the per-vector scale
  * CANCELS in cos = dot(qa,qb)/(|qa|·|qb|), so scoring needs only the
  * int8 codes — integer dot products (exact in longs: 127²·dim ≪
  * 2^63) and ONE double division per pair, micro-quantized with the
  * usual boundary guard. Everything is scan-local codegen'd
  * `transform`/`aggregate` over the array column — quantization is
  * MAP-ONLY, scoring shapes are D90's.
  *
  * Edge contract: the zero vector has no scale — it quantizes to a
  * null code (the cosine-null rule); rounding at the exact .5
  * boundary is guarded per element (`min_quant_dist`).
  */
object Quantize {

  private def toD(vec: Column): Column = transform(vec, x => x.cast("double"))

  /** Per-vector max |x| (the symmetric scale numerator). */
  def maxAbs(vec: Column): Column = array_max(transform(toD(vec), x => abs(x)))

  /** Symmetric int8 codes: round(x/m·127) per element; null when the
    * vector is all-zero (no scale).
    */
  def int8Codes(vec: Column): Column = {
    val m = maxAbs(vec)
    when(m > 0,
      transform(toD(vec), x => round(x / m * 127).cast("int")))
  }

  /** Minimum distance of any element's pre-round |x/m·127| from its
    * .5 rounding boundary — 0.5 for the zero vector (nothing rounds).
    * Aggregate across the frame for the gate's guard row.
    */
  def quantBoundaryDist(vec: Column): Column = {
    val m = maxAbs(vec)
    val scaled = transform(toD(vec), x => x / m * lit(127.0))
    when(m > 0,
      array_min(transform(scaled, s => abs(abs(s - floor(s)) - lit(0.5)))))
      .otherwise(lit(0.5))
  }

  /** Integer dot product of two int8 code arrays (exact in long). */
  def intDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("long") * y.cast("long")),
      lit(0L), (acc, v) => acc + v)

  /** Cosine over int8 codes, micro-quantized: the per-vector scale
    * cancels, so this is the serving-time score. Null when either
    * code is null or zero-norm.
    */
  def int8CosineMicro(a: Column, b: Column): Column = {
    val na = intDot(a, a)
    val nb = intDot(b, b)
    when(a.isNotNull && b.isNotNull && na > 0 && nb > 0,
      round(intDot(a, b).cast("double") /
        (sqrt(na.cast("double")) * sqrt(nb.cast("double"))) * lit(1e6))
        .cast("long"))
  }

  /** Quantize a frame's vector column: adds `scale_micro`
    * (round(m·1e6)), `codes` (int8 as int array, null for the zero
    * vector), and keeps `idCol`. Map-only.
    */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol),
      when(maxAbs(col(vecCol)) > 0,
        round(maxAbs(col(vecCol)) * 1e6).cast("long")).as("scale_micro"),
      int8Codes(col(vecCol)).as("codes"))

  // ---------------------------------------------------------------
  // D100: 1-bit (sign) quantization + Hamming pre-ranking — the
  // extreme end of the compression ladder (float32 → 1 bit/dim, 32×):
  // the binary-quantization scheme production vector stores run as a
  // FIRST pass, because Hamming distance over packed words is a
  // handful of XOR+popcount instructions and the packed corpus often
  // fits in memory where the floats never would. Angular similarity
  // survives sign quantization in expectation (the SimHash/
  // hyperplane-LSH identity: P[sign bit differs] = angle/π), so
  // Hamming RANKS candidates well enough to feed an exact float
  // re-rank of the shortlist — the same two-stage contract as
  // [[graft.ann.Pq.ivfPqTopK]].
  // ---------------------------------------------------------------

  /** Sign-bit codes packed 32 dims per long word (bit i of word w =
    * [v(32w+i) > 0], strictly-positive convention so −0.0/0.0 agree):
    * `ceil(dim/32)` words per vector. 32 — not 64 — dims per word
    * keeps every packed word in `[0, 2^32)`: no sign-bit hazard, and
    * bit-exact to re-derive in ANY engine's plain integer arithmetic
    * (a 64th bit lands on the long's sign and shifts/comparisons stop
    * being portable). Map-only, codegen'd; null vector → null codes.
    */
  def signCodes(vec: Column, dim: Int): Column = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val words = (dim + 31) / 32
    val packed = array((0 until words).map { w =>
      (0 until math.min(32, dim - w * 32)).map { i =>
        val e = element_at(vec, w * 32 + i + 1)
        // SQL NaN compares greater than everything; mask it to the 0-bit so
        // the packing agrees with signCodesLocal's JVM semantics (NaN > 0 false)
        when(!isnan(e) && (e > 0), lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)
    when(vec.isNotNull, packed)
  }

  /** Driver-side twin of [[signCodes]] for the query vector — same
    * NaN-is-0-bit convention (JVM `NaN > 0` is already false).
    */
  def signCodesLocal(query: Array[Double]): Array[Long] =
    Array.tabulate((query.length + 31) / 32) { w =>
      (0 until math.min(32, query.length - w * 32)).foldLeft(0L) { (acc, i) =>
        if (query(w * 32 + i) > 0) acc | (1L << i) else acc
      }
    }

  /** Hamming distance between two packed sign-code arrays:
    * Σ popcount(a XOR b), exact, null if either side is null.
    */
  def hammingDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, v) => acc + v)

  /** D100 serving read path: binary pre-rank + exact re-rank.
    *
    *  1. PACK: map-only sign codes over the corpus (at rest this is
    *     the materialized binary index — dim/8 bytes per vector);
    *  2. PRE-RANK: Hamming distance to the query's packed codes
    *     (XOR+popcount per word — scan-local, codegen'd), keep the
    *     best `rerank` candidates by (hamming asc, id asc) — a
    *     TakeOrdered, so the shuffle carries `rerank` rows;
    *  3. RERANK: join the shortlist back to the float vectors
    *     (broadcast — rerank-bounded) and order by exact cosine.
    *
    * Returns (id, hamming, cosine_sim(4dp)) ordered (cosine desc,
    * id asc), limit k. Recall contract: a true neighbor whose sign
    * pattern disagrees with the query on many dims can fall outside
    * the shortlist; with rerank = |corpus| the output EQUALS the
    * exact scan (spec-gated). At 100 TB the point is stage 2 reads
    * 1/32 of the float bytes and never touches the vectors.
    */
  def binaryTopK(emb: DataFrame, vecCol: String, idCol: String,
                 query: Array[Double], k: Int, rerank: Int): DataFrame = {
    require(k >= 1 && rerank >= k, s"need rerank ($rerank) >= k ($k) >= 1")
    val qCodes = signCodesLocal(query)
    val qLit = array(qCodes.map(lit(_)).toIndexedSeq: _*)
    val cands = emb
      .select(col(idCol),
        hammingDist(signCodes(col(vecCol), query.length), qLit).as("hamming"))
      .filter(col("hamming").isNotNull)
      .orderBy(col("hamming").asc, col(idCol).asc)
      .limit(rerank)
    val qVec = array(query.map(lit(_)).toIndexedSeq: _*)
    emb.join(broadcast(cands), idCol)
      .select(col(idCol), col("hamming"),
        round(graft.ann.Ann.cosine(col(vecCol), qVec), 4).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col(idCol).asc)
      .limit(k)
  }
}
