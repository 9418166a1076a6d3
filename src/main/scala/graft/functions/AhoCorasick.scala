package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern substring scan (SURVEY §2 D74): find
  * which of a BOUNDED needle bank occurs in each document, in ONE
  * pass over the text regardless of bank size — the exact-substring
  * counterpart of D23's shingle-overlap decontamination (short eval
  * canaries, secret markers, and blocklist phrases don't share a
  * 5-gram with anything, so shingle overlap never sees them) and of
  * D62's embedding bank (which catches paraphrase, not verbatim).
  *
  * k naive `contains` calls scan the text k times; the automaton
  * (Aho–Corasick 1975, byte-level over UTF-8 — valid-UTF-8 substring
  * match on bytes ≡ on characters) scans once with O(1) per byte via
  * a fully-materialized goto function (no failure chasing at scan
  * time). The automaton rides in ONE codegen reference object (the
  * BloomContains/NearestCentroid pattern), so a 100 TB pass is
  * MAP-ONLY and stays inside whole-stage codegen.
  *
  * State cost: 256 ints per trie node (nodes ≤ Σ needle bytes) — the
  * needle bank is a bounded DIMENSION (like D62's benchmark bank),
  * never corpus-sized.
  */
object AhoCorasick {

  final class Automaton(delta: Array[Array[Int]], out: Array[Array[Int]],
                        nNeedles: Int) extends Serializable {
    /** Distinct matched needle ids, ascending. */
    def scan(bytes: Array[Byte]): Array[Int] = {
      val hit = new Array[Boolean](nNeedles)
      var nHits = 0
      var st = 0
      var i = 0
      while (i < bytes.length && nHits < nNeedles) {
        st = delta(st)(bytes(i) & 0xFF)
        val o = out(st)
        var j = 0
        while (j < o.length) {
          if (!hit(o(j))) { hit(o(j)) = true; nHits += 1 }
          j += 1
        }
        i += 1
      }
      val res = new Array[Int](nHits)
      var k = 0; var id = 0
      while (id < nNeedles) {
        if (hit(id)) { res(k) = id; k += 1 }
        id += 1
      }
      res
    }
  }

  def build(needles: Seq[Array[Byte]]): Automaton = {
    require(needles.nonEmpty, "AhoCorasick: empty needle bank")
    require(needles.forall(_.nonEmpty), "AhoCorasick: empty needle")
    val trans = scala.collection.mutable.ArrayBuffer[Array[Int]](Array.fill(256)(-1))
    val outs = scala.collection.mutable.ArrayBuffer[List[Int]](Nil)
    needles.zipWithIndex.foreach { case (n, id) =>
      var st = 0
      n.foreach { b =>
        val c = b & 0xFF
        if (trans(st)(c) == -1) {
          trans.append(Array.fill(256)(-1)); outs.append(Nil)
          trans(st)(c) = trans.length - 1
        }
        st = trans(st)(c)
      }
      outs(st) = id :: outs(st)
    }
    val fail = new Array[Int](trans.length)
    val queue = scala.collection.mutable.Queue.empty[Int]
    var c = 0
    while (c < 256) {
      val s = trans(0)(c)
      if (s == -1) trans(0)(c) = 0 else { fail(s) = 0; queue += s }
      c += 1
    }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      outs(u) = outs(u) ++ outs(fail(u))
      var c2 = 0
      while (c2 < 256) {
        val v = trans(u)(c2)
        if (v == -1) trans(u)(c2) = trans(fail(u))(c2)
        else { fail(v) = trans(fail(u))(c2); queue += v }
        c2 += 1
      }
    }
    new Automaton(trans.toArray, outs.map(_.distinct.sorted.toArray).toArray,
      needles.length)
  }
}

/** `multi_contains(text)` → array of matched needle ids (distinct,
  * ascending; empty array = clean). Codegen'd via a single reference
  * object; null input → null.
  */
case class MultiContains(child: Expression, needles: Seq[String])
    extends UnaryExpression {

  require(needles.nonEmpty, "MultiContains: empty needle bank")
  require(needles.forall(_.nonEmpty), "MultiContains: empty needle")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expected a string column, got $other")
    }

  @transient private lazy val automaton =
    AhoCorasick.build(needles.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)))

  def scan(s: UTF8String): ArrayData =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(automaton.scan(s.getBytes))

  override def nullSafeEval(input: Any): Any =
    scan(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("multiContains", this, classOf[MultiContains].getName)
    defineCodeGen(ctx, ev, a => s"$ref.scan($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiContains =
    copy(child = newChild)
}

object MultiContains {
  def apply(c: Column, needles: Seq[String]): Column = {
    import org.apache.spark.sql.graft.SqlBridge
    SqlBridge.column(MultiContains(SqlBridge.expression(c), needles))
  }
}
