package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketches, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Theta distinct sketches with full SET ALGEBRA (SURVEY §2
  * D83) — the missing third of the sketch trio: HLL (D64) answers
  * "distinct over any UNION of snapshots", KLL (D67) quantiles,
  * frequent-items (D69) heavy hitters; none can answer the
  * INTERSECTION/DIFFERENCE questions a multi-source 100 TB corpus
  * budget actually turns on — "how many documents do CommonCrawl and
  * the curated web set share", "how many NEW documents does source B
  * add over A ∪ C". Theta sketches (Dasgupta/Lang/Rhodes, the
  * published Apache DataSketches theta framework) close that: each
  * source is sketched ONCE (map-side-combined TypedImperativeAggregate,
  * same shape as the builtins), and union / intersection / A-not-B
  * compose on the bounded per-source frame without touching the
  * corpus again.
  *
  * Determinism contract (the D69 scheme): while every source stays in
  * the EXACT regime (distinct ≤ nominal entries 2^lgK — no sampling,
  * theta = 1), retained-hash sets are order-independent, so
  * estimates, set-op results, and serialized compact bytes are all
  * engine- and partitioning-deterministic — the driver gate certifies
  * this regime. In the estimation regime only the published bound
  * claims (estimate within ±2σ bounds, set-op error composition) are
  * comparable; the spec suite pins those.
  */
case class ThetaSketchAgg(child: Expression, lgK: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] {

  require(lgK >= 4 && lgK <= 26, s"theta lgK out of range [4,26]: $lgK")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expected a string column, got $other")
  }

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(b1: Union, b2: Union): Union = {
    b1.union(b2.getResult); b1
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray
  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(Sketches.heapifySketch(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = newChildren.head)
}

object ThetaSketchAgg {
  def apply(c: Column, lgK: Int): Column = {
    import org.apache.spark.sql.graft.SqlBridge
    SqlBridge.column(
      ThetaSketchAgg(SqlBridge.expression(c), lgK).toAggregateExpression())
  }
}

/** Merge serialized theta sketches (binary column) into one sketch —
  * the profile-over-snapshot-unions path (D64's hll_union_agg split).
  */
case class ThetaMergeAgg(child: Expression, lgK: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] {

  require(lgK >= 4 && lgK <= 26, s"theta lgK out of range [4,26]: $lgK")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expected serialized theta sketches (binary), got $other")
  }

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null)
      buf.union(Sketches.heapifySketch(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(b1: Union, b2: Union): Union = {
    b1.union(b2.getResult); b1
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray
  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(Sketches.heapifySketch(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaMergeAgg =
    copy(child = newChildren.head)
}

object ThetaMergeAgg {
  def apply(c: Column, lgK: Int): Column = {
    import org.apache.spark.sql.graft.SqlBridge
    SqlBridge.column(
      ThetaMergeAgg(SqlBridge.expression(c), lgK).toAggregateExpression())
  }
}

/** Distinct estimate of a serialized theta sketch. Bounded-frame
  * accessor (one heapify per row of a per-source dimension frame) —
  * interpreted eval is deliberate, same rationale as [[KllQuantile]].
  */
case class ThetaEstimate(child: Expression) extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expected a serialized theta sketch (binary), got $other")
  }

  override def nullSafeEval(input: Any): Any =
    Sketches.heapifySketch(Memory.wrap(input.asInstanceOf[Array[Byte]]))
      .getEstimate

  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}

object ThetaEstimate {
  def apply(c: Column): Column = {
    import org.apache.spark.sql.graft.SqlBridge
    SqlBridge.column(ThetaEstimate(SqlBridge.expression(c)))
  }
}

/** Set operation over two serialized theta sketches → the serialized
  * RESULT sketch, so operations compose: `estimate(op(op(a,b),c))`.
  * `op` is one of "union", "intersect", "anotb" (A \ B). Bounded-frame
  * accessor like [[ThetaEstimate]].
  */
case class ThetaSetOp(left: Expression, right: Expression, op: String)
    extends BinaryExpression with CodegenFallback {

  require(ThetaSetOp.Ops.contains(op),
    s"theta op must be one of ${ThetaSetOp.Ops.mkString("/")}: $op")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"expected two serialized theta sketches (binary, binary), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val sa = Sketches.heapifySketch(Memory.wrap(a.asInstanceOf[Array[Byte]]))
    val sb = Sketches.heapifySketch(Memory.wrap(b.asInstanceOf[Array[Byte]]))
    val r = op match {
      case "union" =>
        // the union builder's DEFAULT nominal entries (2^12) would
        // DOWNSAMPLE an exact union of larger exact inputs (x10
        // regression: a 4352-distinct pair union estimated 4336).
        // 2^26 is the library max; memory grows only with retained
        // entries, and inputs already bound those, so this keeps the
        // result exact whenever both inputs are exact.
        SetOperation.builder().setLogNominalEntries(26).buildUnion().union(sa, sb)
      case "intersect" =>
        SetOperation.builder().buildIntersection().intersect(sa, sb)
      case "anotb" =>
        SetOperation.builder().buildANotB().aNotB(sa, sb)
    }
    r.toByteArray
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaSetOp =
    copy(left = newLeft, right = newRight)
}

object ThetaSetOp {
  val Ops: Set[String] = Set("union", "intersect", "anotb")
  def apply(a: Column, b: Column, op: String): Column = {
    import org.apache.spark.sql.graft.SqlBridge
    SqlBridge.column(ThetaSetOp(SqlBridge.expression(a), SqlBridge.expression(b), op))
  }
}
