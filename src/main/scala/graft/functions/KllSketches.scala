package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Mergeable KLL quantile sketches (Apache DataSketches) as custom
  * Catalyst aggregates — the quantile counterpart of the HLL distinct
  * sketches (SURVEY §2 D64): Spark's own `approx_percentile` (GK) has
  * no user-facing mergeable form, so incremental profiling — sketch
  * each ingest batch once, answer "quantiles over any union of
  * snapshots" later — needs a sketch whose merge is first-class. KLL
  * is that sketch (Karnin/Lang/Liberty FOCS 2016): fixed ~k·log(n/k)
  * space, full mergeability, and published worst-case normalized rank
  * error (~1.65% two-sided at k=200) that the gate certifies against
  * exact order statistics (the a14 GK-certification scheme).
  *
  * Two aggregates, the same split as `hll_sketch_agg`/`hll_union_agg`:
  * [[KllSketchAgg]] builds a sketch from a double column;
  * [[KllMergeAgg]] merges serialized sketches. Both are
  * `TypedImperativeAggregate` (object buffer, partial-merge capable:
  * map-side partials collapse before the exchange exactly like any
  * builtin agg). NOTE: KLL compaction is randomized (unseedable
  * ThreadLocalRandom), so serialized sketch BYTES are not
  * run-deterministic — only rank-error claims are gate-comparable,
  * never raw sketch bytes (unlike the HLL path, whose estimates are
  * deterministic for a fixed item multiset).
  */
case class KllSketchAgg(child: Expression, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] {

  require(k >= 8 && k <= 65535, s"KLL k out of range: $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: NumericType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expected a numeric column, got $other")
    }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(child.dataType match {
      case DoubleType  => v.asInstanceOf[Double]
      case FloatType   => v.asInstanceOf[Float].toDouble
      case IntegerType => v.asInstanceOf[Int].toDouble
      case LongType    => v.asInstanceOf[Long].toDouble
      case ShortType   => v.asInstanceOf[Short].toDouble
      case ByteType    => v.asInstanceOf[Byte].toDouble
      case d: DecimalType => v.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble
      case dt => throw new IllegalStateException(s"unsupported numeric type $dt")
    })
    buf
  }

  override def merge(b1: KllDoublesSketch, b2: KllDoublesSketch): KllDoublesSketch = {
    b1.merge(b2); b1
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllSketchAgg =
    copy(child = newChildren.head)
}

object KllSketchAgg {
  def apply(c: Column, k: Int): Column = {
    import org.apache.spark.sql.graft.SqlBridge
    SqlBridge.column(
      KllSketchAgg(SqlBridge.expression(c), k).toAggregateExpression())
  }
}

/** Merge serialized KLL sketches (binary column) into one sketch. */
case class KllMergeAgg(child: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expected serialized KLL sketches (binary), got $other")
    }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(b1: KllDoublesSketch, b2: KllDoublesSketch): KllDoublesSketch = {
    b1.merge(b2); b1
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllMergeAgg =
    copy(child = newChildren.head)
}

object KllMergeAgg {
  def apply(c: Column, k: Int): Column = {
    import org.apache.spark.sql.graft.SqlBridge
    SqlBridge.column(
      KllMergeAgg(SqlBridge.expression(c), k).toAggregateExpression())
  }
}

/** Scalar quantile extraction from a serialized KLL sketch — applied
  * to the BOUNDED merged-sketch frame (≤ |snapshots|·|cols| rows), so
  * interpreted eval (CodegenFallback) is deliberate: one heapify per
  * row of a dimension-sized frame, never on a corpus scan.
  */
case class KllQuantile(child: Expression, q: Double) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(q >= 0.0 && q <= 1.0, s"quantile out of range: $q")

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expected a serialized KLL sketch (binary), got $other")
    }

  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any = {
    val s = KllDoublesSketch.heapify(Memory.wrap(input.asInstanceOf[Array[Byte]]))
    if (s.isEmpty) null else s.getQuantile(q)
  }

  override protected def withNewChildInternal(newChild: Expression): KllQuantile =
    copy(child = newChild)
}

object KllQuantile {
  def apply(c: Column, q: Double): Column = {
    import org.apache.spark.sql.graft.SqlBridge
    SqlBridge.column(KllQuantile(SqlBridge.expression(c), q))
  }
}

/** Normalized rank (empirical CDF value) of `value` in a serialized
  * KLL sketch — the accessor the sketch-grid KS flavor (D78) needs:
  * evaluate both sides' CDFs on a common grid, take the max gap,
  * certified within ±2·ε by KLL's published rank error. Same
  * bounded-frame CodegenFallback rationale as [[KllQuantile]].
  */
case class KllRank(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expected (serialized KLL sketch, double value), got $other")
    }

  override def nullable: Boolean = true
  override def nullSafeEval(sketch: Any, v: Any): Any = {
    val s = KllDoublesSketch.heapify(Memory.wrap(sketch.asInstanceOf[Array[Byte]]))
    if (s.isEmpty) null else s.getRank(v.asInstanceOf[Double])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllRank =
    copy(left = newLeft, right = newRight)
}

object KllRank {
  def apply(sketch: Column, value: Column): Column = {
    import org.apache.spark.sql.graft.SqlBridge
    SqlBridge.column(
      KllRank(SqlBridge.expression(sketch), SqlBridge.expression(value)))
  }
}
