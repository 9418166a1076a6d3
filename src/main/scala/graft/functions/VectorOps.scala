package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native vector-bank expressions: a row vector scored against a
  * DRIVER-SIDE constant matrix (k-means centroids, LSH hyperplane
  * families).
  *
  * Why native and not `greatest(struct(cosine(vec, litVec(c)), i))`:
  * a k=8 x dim=64 centroid bank inlined as literals is a ~4000-node
  * expression tree, and Janino spends seconds compiling EVERY plan
  * that embeds it (each Lloyd iteration is a fresh plan — the r2
  * bench measured 6 s for two iterations plus a probe on 60k rows).
  * Here the matrix rides along as one codegen reference object and
  * the generated code is a single method call, so plan compilation
  * is O(1) in both k and dim, and evaluation is a primitive loop.
  */
private[functions] trait VectorBankExpression extends UnaryExpression {
  override def dataType: DataType

  protected def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(_: NumericType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expected a numeric array, got $other")
    }

  /** Element read as double; null elements read as 0 (same convention
    * as [[DotProduct]]).
    */
  protected final def elem(a: ArrayData, i: Int): Double = {
    if (a.isNullAt(i)) return 0.0
    elemType match {
      case FloatType   => a.getFloat(i).toDouble
      case DoubleType  => a.getDouble(i)
      case IntegerType => a.getInt(i).toDouble
      case LongType    => a.getLong(i).toDouble
      case ShortType   => a.getShort(i).toDouble
      case ByteType    => a.getByte(i).toDouble
      case dt => throw new IllegalStateException(s"unsupported element type $dt")
    }
  }
}

/** Index of the max-cosine centroid for a vector column. Ties and
  * NaNs follow Spark's double ordering (NaN greatest; later index
  * wins a tie) — the exact semantics of the
  * `greatest(struct(sim, i))` formulation it replaces. Returns null
  * only for a null input vector, so k=1 and degenerate inputs are
  * safe (ADVICE r2: the literal formulation crashed on k=1 via
  * single-argument `greatest` and NPE'd on null vectors).
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends VectorBankExpression {

  require(centroids.nonEmpty, "need at least one centroid")

  override def dataType: DataType = IntegerType

  @transient private lazy val norms: Array[Double] =
    centroids.map(c => math.sqrt(c.map(x => x * x).sum))

  def nearest(a: ArrayData): Int = {
    val nElems = a.numElements()
    // |vec| scales every cosine identically, so the argmax (and its
    // tie structure) is already decided by dot(vec, c_i) / |c_i| —
    // except when |vec| = 0 maps all sims to NaN; divide to keep
    // NaN-vs-NaN ordering faithful to the literal formulation.
    var vn = 0.0
    var i = 0
    while (i < nElems) { val v = elem(a, i); vn += v * v; i += 1 }
    vn = math.sqrt(vn)
    var best = Double.NegativeInfinity
    var bestSet = false
    var bestIdx = 0
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      val n = math.min(nElems, cent.length)
      var dot = 0.0
      var j = 0
      while (j < n) { dot += elem(a, j) * cent(j); j += 1 }
      val sim = dot / (vn * norms(c))
      // java.lang.Double.compare = Spark's double ordering (NaN > all)
      if (!bestSet || java.lang.Double.compare(sim, best) >= 0) {
        best = sim; bestIdx = c; bestSet = true
      }
      c += 1
    }
    bestIdx
  }

  override def nullSafeEval(input: Any): Any = nearest(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroid", this, classOf[NearestCentroid].getName)
    defineCodeGen(ctx, ev, a => s"$ref.nearest($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {
  def apply(vec: Column, centroids: Array[Array[Double]]): Column = {
    import org.apache.spark.sql.graft.SqlBridge
    SqlBridge.column(NearestCentroid(SqlBridge.expression(vec), centroids))
  }
}

/** Index of the min-L2 centroid for a SUBRANGE of the input vector —
  * the per-subspace assignment step of product quantization. The
  * score is `dot(c,c) − 2·dot(v,c)` (the vector's own self-dot is
  * constant under argmin), with both dots accumulated left-to-right
  * in doubles — EXACTLY `list_dot_product(c,c) −
  * 2*list_dot_product(v,c)` in an external SQL engine, so an oracle
  * can reproduce the assignment bit-for-bit. Ties: the EARLIER
  * centroid index wins (strict-less update; argmin convention —
  * NOTE this differs from [[NearestCentroid]]'s documented
  * later-wins max-cosine rule). Null input vector → null; null
  * elements read as 0.
  *
  * `offset`/`length` select the subvector (offset is 0-based);
  * centroids are `length`-dimensional.
  */
case class NearestCentroidL2(child: Expression, centroids: Array[Array[Double]],
                             offset: Int, length: Int)
    extends VectorBankExpression {

  require(centroids.nonEmpty, "need at least one centroid")
  require(offset >= 0 && length > 0, "need a non-empty subrange")

  override def dataType: DataType = IntegerType

  @transient private lazy val selfDots: Array[Double] =
    centroids.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      s
    }

  def nearest(a: ArrayData): Int = {
    val n = a.numElements()
    var best = Double.PositiveInfinity
    var bestIdx = 0
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      val hi = math.min(length, math.min(cent.length, n - offset))
      var dot = 0.0
      var j = 0
      while (j < hi) { dot += elem(a, offset + j) * cent(j); j += 1 }
      val score = selfDots(c) - 2 * dot
      if (score < best) { best = score; bestIdx = c } // strict: earlier wins
      c += 1
    }
    bestIdx
  }

  override def nullSafeEval(input: Any): Any = nearest(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroidL2", this, classOf[NearestCentroidL2].getName)
    defineCodeGen(ctx, ev, a => s"$ref.nearest($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidL2 =
    copy(child = newChild)
}

object NearestCentroidL2 {
  def apply(vec: Column, centroids: Array[Array[Double]],
            offset: Int, length: Int): Column = {
    import org.apache.spark.sql.graft.SqlBridge
    SqlBridge.column(NearestCentroidL2(SqlBridge.expression(vec), centroids, offset, length))
  }
}

/** Sign-bit LSH keys of a vector against `tables` independent
  * hyperplane families (multi-table random-hyperplane LSH): element
  * `t` of the result is family `t`'s bucket key — bit `p` set iff
  * `dot(vec, plane(t)(p)) >= 0`. Multiple families recover the
  * recall a single deep key gives up: a near-dup pair missed by one
  * family's 2^planes-way split collides in another, while candidate
  * volume stays ~tables * n^2 / 2^planes instead of n^2 / 2^shallow.
  */
case class HyperplaneKeys(child: Expression, planes: Array[Array[Array[Double]]])
    extends VectorBankExpression {

  require(planes.nonEmpty && planes.head.nonEmpty, "need >= 1 table of >= 1 plane")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  def keys(a: ArrayData): GenericArrayData = {
    val nElems = a.numElements()
    val out = new Array[Any](planes.length)
    var t = 0
    while (t < planes.length) {
      val fam = planes(t)
      var key = 0L
      var p = 0
      while (p < fam.length) {
        val plane = fam(p)
        val n = math.min(nElems, plane.length)
        var dot = 0.0
        var j = 0
        while (j < n) { dot += elem(a, j) * plane(j); j += 1 }
        if (dot >= 0) key |= (1L << p)
        p += 1
      }
      out(t) = key
      t += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = keys(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplaneKeys", this, classOf[HyperplaneKeys].getName)
    defineCodeGen(ctx, ev, a => s"$ref.keys($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneKeys =
    copy(child = newChild)
}

object HyperplaneKeys {
  /** Deterministic plane bank: family `t`, plane `p` drawn from
    * `Random(seed + t)` gaussians — family 0 with the same seed and
    * plane count reproduces the plane sequence the r1/r2 literal
    * formulation drew from `Random(seed)`.
    */
  def planeBank(dim: Int, planesPerTable: Int, tables: Int,
                seed: Long): Array[Array[Array[Double]]] =
    Array.tabulate(tables) { t =>
      val rnd = new scala.util.Random(seed + t)
      Array.fill(planesPerTable)(Array.fill(dim)(rnd.nextGaussian()))
    }

  def apply(vec: Column, bank: Array[Array[Array[Double]]]): Column = {
    import org.apache.spark.sql.graft.SqlBridge
    SqlBridge.column(HyperplaneKeys(SqlBridge.expression(vec), bank))
  }
}

/** Dense matrix–vector product: out[j] = (Σ_i v[i]·m[j][i]) / divisor
  * — the map-only projection step of Johnson–Lindenstrauss
  * dimensionality reduction (and any fixed linear head). The matrix
  * rides as ONE codegen reference object (same O(1)-plan rationale as
  * [[NearestCentroid]]); each output component accumulates
  * left-to-right in doubles with the final division applied to the
  * SUM, so an external SQL engine reproduces every component
  * bit-for-bit as `list_dot_product(v, row_j) / divisor`. Null input
  * vector → null row; null elements read as 0; input shorter than a
  * matrix row reads missing elements as 0.
  */
case class MatVec(child: Expression, matrix: Array[Array[Double]],
                  divisor: Double)
    extends VectorBankExpression {

  require(matrix.nonEmpty, "need a non-empty matrix")
  require(divisor != 0.0, "divisor must be non-zero")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  def project(a: ArrayData): GenericArrayData = {
    val nElems = a.numElements()
    val out = new Array[Any](matrix.length)
    var j = 0
    while (j < matrix.length) {
      val row = matrix(j)
      val n = math.min(nElems, row.length)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += elem(a, i) * row(i); i += 1 }
      out(j) = dot / divisor
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = project(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("matVec", this, classOf[MatVec].getName)
    defineCodeGen(ctx, ev, a => s"$ref.project($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): MatVec =
    copy(child = newChild)
}

object MatVec {
  def apply(vec: Column, matrix: Array[Array[Double]], divisor: Double): Column = {
    import org.apache.spark.sql.graft.SqlBridge
    SqlBridge.column(MatVec(SqlBridge.expression(vec), matrix, divisor))
  }
}

/** Bloom-filter membership test against DRIVER-SIDE serialized filter
  * bits (see [[graft.dedup.Bloom]]): true = possibly present, false =
  * definitely absent. The bits ride as one codegen reference object —
  * a broadcast-sized dimension, same rationale as the vector banks —
  * and the test string hashes exactly like `BloomFilter.putString`
  * (UTF-8 bytes), so a filter built by `DataFrame.stat.bloomFilter`
  * over the same string column round-trips. Null input → null.
  */
case class BloomContains(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  require(filterBytes.nonEmpty, "empty filter bytes")

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expected a string key (cast content hashes to string), got $other")
    }

  @transient private lazy val filter: org.apache.spark.util.sketch.BloomFilter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(filterBytes))

  def test(s: org.apache.spark.unsafe.types.UTF8String): Boolean =
    filter.mightContainBinary(s.getBytes)

  override def nullSafeEval(input: Any): Any =
    test(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomContains", this, classOf[BloomContains].getName)
    defineCodeGen(ctx, ev, a => s"$ref.test($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContains =
    copy(child = newChild)
}

object BloomContains {
  def apply(key: Column, filterBytes: Array[Byte]): Column = {
    import org.apache.spark.sql.graft.SqlBridge
    SqlBridge.column(BloomContains(SqlBridge.expression(key), filterBytes))
  }
}
