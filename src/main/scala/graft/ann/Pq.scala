package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization — the storage/serving path for billion-scale
  * vector search: a d-dim float vector (256 B at d=64) compresses to
  * `m` small centroid codes (m bytes), and approximate distances are
  * evaluated from an m×k lookup table without touching the original
  * floats. At 100 TB of embeddings this is the difference between
  * scanning vectors and scanning codes.
  *
  * Scale shape: codebooks are TRAINED once and ride as driver-side
  * constants; encoding is a map-only scan (one codegen'd
  * [[graft.functions.NearestCentroidL2]] call per subspace — no
  * shuffle, no join); ADC scoring is a map-only scan over codes plus
  * one TakeOrdered for top-k.
  *
  * Determinism: per-subspace assignment scores are
  * `dot(c,c) − 2·dot(v,c)` with left-to-right double accumulation,
  * and ADC sums its m lookup terms in subspace order — every number
  * here is reproducible bit-for-bit by an external SQL engine
  * (`list_dot_product` + ordered addition), which is what the q_d36
  * oracle does.
  */
object Pq {

  /** Per-subspace codebooks from the first `k` vectors by id
    * (deterministic seeding, same convention as
    * [[Ann.trainCentroidsBySample]]): codebooks(j)(c) is the j-th
    * subvector of sample vector c. Swap in per-subspace Lloyd
    * refinement ([[Ann.trainCentroidsKMeans]] over sliced columns)
    * when codebook quality matters more than oracle-reproducibility.
    */
  def codebooksBySample(emb: DataFrame, vecCol: String, idCol: String,
                        m: Int, k: Int, dim: Int): Array[Array[Array[Double]]] = {
    require(dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    val sub = dim / m
    val sample = emb.orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    Array.tabulate(m)(j => sample.map(_.slice(j * sub, j * sub + sub)))
  }

  /** id + `code_0..code_{m-1}` int columns (the PQ code words). One
    * scan-local projection; at rest the codes are what a serving
    * store persists instead of the vectors.
    */
  def encode(emb: DataFrame, vecCol: String, idCol: String,
             codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    val codes = (0 until m).map { j =>
      graft.functions.NearestCentroidL2(col(vecCol), codebooks(j), j * sub, sub)
        .as(s"code_$j")
    }
    emb.select(col(idCol) +: codes: _*)
  }

  /** Asymmetric-distance top-k: the query is quantized against each
    * codebook into an m×k lookup table of exact
    * `dot(q_j,q_j) − 2·dot(q_j,c) + dot(c,c)` scores (squared L2 of
    * the query subvector to the centroid), and each encoded row costs
    * m table lookups summed in subspace order. Returns (id, adc)
    * rounded to 4 decimals, ordered (adc asc, id asc).
    */
  def adcTopK(encoded: DataFrame, idCol: String,
              codebooks: Array[Array[Array[Double]]],
              query: Array[Double], k: Int): DataFrame = {
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) { s += a(i) * b(i); i += 1 }
      s
    }
    val luts: Array[Array[Double]] = Array.tabulate(m) { j =>
      val qj = query.slice(j * sub, j * sub + sub)
      val dq = dot(qj, qj)
      codebooks(j).map(c => dq - 2 * dot(qj, c) + dot(c, c))
    }
    val terms = (0 until m).map { j =>
      element_at(array(luts(j).map(lit(_)).toIndexedSeq: _*), col(s"code_$j") + 1)
    }
    // left-fold keeps the addition order = subspace order (engine-
    // reproducible), unlike a commutative sum
    val adc = terms.reduceLeft(_ + _)
    encoded.select(col(idCol), round(adc, 4).as("adc"))
      .orderBy(col("adc").asc, col(idCol).asc)
      .limit(k)
  }
}
