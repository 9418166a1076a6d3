package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** D102: mergeable count-min sketches — the point-frequency member of
  * the sketch family (D64 HLL answers "how many distinct", D67 KLL
  * "what quantile", D69 frequent-items "which keys dominate", D83
  * theta "set algebra"; count-min answers "ABOUT HOW OFTEN does this
  * one key occur" in O(depth·width) memory with a one-sided
  * guarantee: never an undercount, overcount ≤ ε·N with probability
  * 1−δ). The 100 TB shape is the D64/D67 one: per-slice sketches
  * build in ONE map-side-combined pass, persist as bytes next to the
  * slice (daily partitions, per-source snapshots), and MERGE is exact
  * counter addition — so "how often did this URL appear across the
  * last 90 daily crawls" is 90 sketch reads, not a 90-day rescan.
  *
  * Built on Spark's own `org.apache.spark.util.sketch.CountMinSketch`
  * (the public class behind `df.stat.countMinSketch`), pinned to a
  * caller-fixed seed: a fixed seed makes every estimate DETERMINISTIC
  * and the build/merge pair partitioning-independent (counters sum),
  * which is what lets the gate hash claim rows instead of eyeballing.
  *
  * Items are hashed AS STRINGS (UTF8String → String; numerics via
  * their canonical string) — one hashing domain, so a key queried
  * later matches the key ingested, whatever column type it rode in.
  */
object CountMinSketches {

  private[functions] def toItem(dt: DataType, v: Any): String = dt match {
    case StringType => v.asInstanceOf[UTF8String].toString
    // internal value is days-since-epoch; hash the ISO display string so a
    // later CountMinEstimate probe with the natural '2023-07-14' key matches
    case DateType   => java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong).toString
    case _          => v.toString
  }

  private[functions] def toBytes(s: CountMinSketch): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    s.writeTo(bos)
    bos.toByteArray
  }

  private[functions] def fromBytes(b: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(b))
}

/** Build a count-min sketch over a column (any atomic type; hashed by
  * canonical string). Returns the serialized sketch (binary).
  */
case class CountMinAgg(child: Expression, depth: Int, width: Int, seed: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CountMinSketch] {

  require(depth >= 1 && width >= 1, s"bad CMS dims: $depth x $width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | _: NumericType | BooleanType | DateType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case TimestampType | TimestampNTZType =>
        // a timestamp's display string depends on the session timezone, so
        // there is no one canonical probe key — make the caller pick one
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "timestamp columns have no timezone-independent canonical string; " +
            "format explicitly (date_format/cast to string) before sketching")
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expected an atomic column, got $other")
    }

  override def createAggregationBuffer(): CountMinSketch =
    CountMinSketch.create(depth, width, seed)

  override def update(buf: CountMinSketch, input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v != null) buf.addString(CountMinSketches.toItem(child.dataType, v))
    buf
  }

  override def merge(b1: CountMinSketch, b2: CountMinSketch): CountMinSketch = {
    b1.mergeInPlace(b2); b1
  }

  override def eval(buf: CountMinSketch): Any = CountMinSketches.toBytes(buf)
  override def serialize(buf: CountMinSketch): Array[Byte] =
    CountMinSketches.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    CountMinSketches.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): CountMinAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren.head)
}

object CountMinAgg {
  def apply(c: Column, depth: Int, width: Int, seed: Int): Column = {
    import org.apache.spark.sql.graft.SqlBridge
    SqlBridge.column(
      CountMinAgg(SqlBridge.expression(c), depth, width, seed)
        .toAggregateExpression())
  }
}

/** Merge serialized count-min sketches (binary column) into one —
  * exact counter addition, so merge(per-slice sketches) is
  * BYTE-IDENTICAL to one sketch built over the union (spec + gate
  * claim). Sketches must share (depth, width, seed); Spark's
  * `mergeInPlace` throws loudly on a shape mismatch.
  */
case class CountMinMergeAgg(child: Expression, depth: Int, width: Int,
                            seed: Int,
                            mutableAggBufferOffset: Int = 0,
                            inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CountMinSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expected serialized sketches (binary), got $other")
    }

  override def createAggregationBuffer(): CountMinSketch =
    CountMinSketch.create(depth, width, seed)

  override def update(buf: CountMinSketch, input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.mergeInPlace(CountMinSketches.fromBytes(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(b1: CountMinSketch, b2: CountMinSketch): CountMinSketch = {
    b1.mergeInPlace(b2); b1
  }

  override def eval(buf: CountMinSketch): Any = CountMinSketches.toBytes(buf)
  override def serialize(buf: CountMinSketch): Array[Byte] =
    CountMinSketches.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    CountMinSketches.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): CountMinMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinMergeAgg =
    copy(child = newChildren.head)
}

object CountMinMergeAgg {
  def apply(c: Column, depth: Int, width: Int, seed: Int): Column = {
    import org.apache.spark.sql.graft.SqlBridge
    SqlBridge.column(
      CountMinMergeAgg(SqlBridge.expression(c), depth, width, seed)
        .toAggregateExpression())
  }
}

/** Point estimate from a serialized sketch for a string item —
  * deterministic for a fixed-seed sketch; the CMS guarantee is
  * estimate ≥ true count always, ≤ true + ε·N w.p. 1−δ. Meant for
  * BOUNDED probe frames (a key dim crossed with one sketch row), the
  * D64/D67 extraction shape — each eval deserializes the sketch.
  */
case class CountMinEstimate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expected (sketch binary, item string), got $other")
    }

  def estimate(sketch: Any, item: Any): Long =
    CountMinSketches.fromBytes(sketch.asInstanceOf[Array[Byte]])
      .estimateCount(item.asInstanceOf[UTF8String].toString)

  override def nullSafeEval(sketch: Any, item: Any): Any = estimate(sketch, item)

  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("countMinEstimate", this,
      classOf[CountMinEstimate].getName)
    defineCodeGen(ctx, ev, (a, b) => s"$ref.estimate($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountMinEstimate =
    copy(left = newLeft, right = newRight)
}

object CountMinEstimate {
  def apply(sketch: Column, item: Column): Column = {
    import org.apache.spark.sql.graft.SqlBridge
    SqlBridge.column(CountMinEstimate(
      SqlBridge.expression(sketch), SqlBridge.expression(item)))
  }
}
