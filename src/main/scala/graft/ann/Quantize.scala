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
}
