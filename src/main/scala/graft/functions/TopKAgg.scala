package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** D90 support: exact grouped top-k as a MAP-SIDE-COMBINING custom
  * Catalyst aggregate. Spark's idiomatic grouped top-k is a
  * `row_number` window — which SHUFFLES THE ENTIRE scored frame to
  * rank it (for batch retrieval: |corpus| × |queries| rows through
  * the wire to keep k per query). A TypedImperativeAggregate keeps
  * a bounded (k-sized) buffer per group and partial-merges like any
  * builtin agg, so each partition ships AT MOST groups × k pairs —
  * the same reduction `TakeOrdered` performs for the single-query
  * case (D6), generalized to arbitrary group counts. The D64/D67/
  * D69/D83 sketch-aggregate idiom, but EXACT: top-k under a total
  * order is losslessly mergeable.
  *
  * Order contract: (score DESC, id ASC) — a total order over
  * (long, long) pairs, so the result is partitioning- and
  * merge-order-independent, bit-exact on any engine. Scores are
  * caller-quantized longs (micro units — the repo-wide float
  * discipline); null score or id is skipped.
  */
case class TopKPairsAgg(score: Expression, id: Expression, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKPairsAgg.Buffer] {

  require(k >= 1 && k <= (1 << 20), s"k must be in [1, 2^20], got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(TopKPairsAgg.entryType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (LongType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expected (BIGINT score, BIGINT id), got $other")
    }

  override def createAggregationBuffer(): TopKPairsAgg.Buffer =
    new TopKPairsAgg.Buffer(k)

  override def update(buf: TopKPairsAgg.Buffer, input: InternalRow): TopKPairsAgg.Buffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.offer(s.asInstanceOf[Long], i.asInstanceOf[Long])
    buf
  }

  override def merge(b1: TopKPairsAgg.Buffer, b2: TopKPairsAgg.Buffer): TopKPairsAgg.Buffer = {
    b2.foreach((s, i) => b1.offer(s, i))
    b1
  }

  override def eval(buf: TopKPairsAgg.Buffer): Any = {
    val sorted = buf.sortedDesc
    new GenericArrayData(sorted.map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i))
    })
  }

  override def serialize(buf: TopKPairsAgg.Buffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopKPairsAgg.Buffer =
    TopKPairsAgg.Buffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairsAgg =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKPairsAgg {

  val entryType: StructType = StructType(Seq(
    StructField("score_micro", LongType, nullable = false),
    StructField("id", LongType, nullable = false)))

  def apply(score: Column, id: Column, k: Int): Column = {
    import org.apache.spark.sql.graft.SqlBridge
    SqlBridge.column(TopKPairsAgg(
      SqlBridge.expression(score), SqlBridge.expression(id), k)
      .toAggregateExpression())
  }

  /** Bounded top-k buffer under (score DESC, id ASC): a min-heap
    * keyed "worst first" so the eviction candidate is O(1). ≤ k
    * entries ever held.
    */
  final class Buffer(val k: Int) {
    // worst-first comparator: lower score first; among equal scores,
    // LARGER id first (so the head is always the entry top-k drops)
    private val heap = new java.util.PriorityQueue[Array[Long]](
      math.min(k, 16),
      (a: Array[Long], b: Array[Long]) => {
        val c = java.lang.Long.compare(a(0), b(0))
        if (c != 0) c else java.lang.Long.compare(b(1), a(1))
      })

    private def worseThanHead(s: Long, i: Long): Boolean = {
      val h = heap.peek()
      s < h(0) || (s == h(0) && i > h(1))
    }

    def offer(s: Long, i: Long): Unit = {
      if (heap.size < k) { heap.add(Array(s, i)); () }
      else if (!worseThanHead(s, i)) { heap.poll(); heap.add(Array(s, i)); () }
    }

    def foreach(f: (Long, Long) => Unit): Unit = {
      val it = heap.iterator()
      while (it.hasNext) { val e = it.next(); f(e(0), e(1)) }
    }

    /** Entries best-first: (score DESC, id ASC). */
    def sortedDesc: Array[(Long, Long)] = {
      val arr = new Array[(Long, Long)](heap.size)
      var n = 0
      val it = heap.iterator()
      while (it.hasNext) { val e = it.next(); arr(n) = (e(0), e(1)); n += 1 }
      scala.util.Sorting.stableSort(arr,
        (a: (Long, Long), b: (Long, Long)) =>
          a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
      arr
    }

    def toBytes: Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + heap.size * 16)
      bb.putInt(k).putInt(heap.size)
      foreach((s, i) => { bb.putLong(s); bb.putLong(i); () })
      bb.array()
    }
  }

  object Buffer {
    def fromBytes(bytes: Array[Byte]): Buffer = {
      val bb = ByteBuffer.wrap(bytes)
      val buf = new Buffer(bb.getInt)
      val n = bb.getInt
      var j = 0
      while (j < n) { buf.offer(bb.getLong, bb.getLong); j += 1 }
      buf
    }
  }
}
