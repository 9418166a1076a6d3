package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** TR national-ID (TCKN) and tax-number checksum validators as native
  * Catalyst expressions (reference algorithms: TRnoChecker.py:1-21 and
  * TRnoChecker.py:24-51).
  *
  * The pure-`Column` formulation of these checksums is a ~200-node
  * expression tree (10-11 substring+cast digit extractions, nested
  * pmods, a `when` chain), and `taxNumValid` embeds the whole TCKN
  * tree as its 11-digit branch — Janino takes seconds to compile the
  * generated method, dwarfing the actual scan. Here each validator is
  * one static JVM method over the raw UTF8 bytes; codegen emits a
  * single call, so the surrounding whole-stage pipeline stays tiny
  * and compiles instantly at any expression-tree depth.
  */
object TrChecksums {

  /** TCKN rule (TRnoChecker.py:1-21): 11 digits, first nonzero,
    * d10 == (7*(d1+d3+d5+d7+d9) - (d2+d4+d6+d8)) mod 10,
    * d11 == (d1+..+d10) mod 10.
    */
  def tckn(s: UTF8String): Boolean = {
    if (s == null || s.numBytes() != 11) return false
    val b = s.getBytes
    var i = 0
    while (i < 11) { if (b(i) < '0' || b(i) > '9') return false; i += 1 }
    if (b(0) == '0') return false
    def d(i: Int): Int = b(i) - '0'
    val odd = d(0) + d(2) + d(4) + d(6) + d(8)
    val even = d(1) + d(3) + d(5) + d(7)
    (((7 * odd - even) % 10 + 10) % 10 == d(9)) &&
      ((odd + even + d(9)) % 10 == d(10))
  }

  /** Tax-number rule (TRnoChecker.py:24-48): for x in 0..8,
    * t1=(d[x]+(9-x))%10; t2=(t1*2^(9-x))%9, but 9 when t1!=0 and
    * t2==0; check digit = (10 - total%10)%10 == d[9]. 11-digit
    * inputs fall back to the TCKN rule (TRnoChecker.py:50-51).
    */
  def tax(s: UTF8String): Boolean = {
    if (s == null) return false
    if (s.numBytes() == 11) return tckn(s)
    if (s.numBytes() != 10) return false
    val b = s.getBytes
    var i = 0
    while (i < 10) { if (b(i) < '0' || b(i) > '9') return false; i += 1 }
    var total = 0
    var x = 0
    while (x <= 8) {
      val t1 = ((b(x) - '0') + (9 - x)) % 10
      var t2 = (t1 * (1 << (9 - x))) % 9
      if (t1 != 0 && t2 == 0) t2 = 9
      total += t2
      x += 1
    }
    (10 - total % 10) % 10 == (b(9) - '0')
  }
}

abstract class TrChecksumExpr extends UnaryExpression {
  override def dataType: DataType = BooleanType
  protected def methodName: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TrChecksums.$methodName($c)")
}

/** `tckn_valid(str)` — boolean, null iff the input is null. */
case class TcknValid(child: Expression) extends TrChecksumExpr {
  override protected def methodName: String = "tckn"
  override def nullSafeEval(input: Any): Any =
    TrChecksums.tckn(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): TcknValid =
    copy(child = newChild)
}

/** `taxnum_valid(str)` — boolean, null iff the input is null. */
case class TaxNumValid(child: Expression) extends TrChecksumExpr {
  override protected def methodName: String = "tax"
  override def nullSafeEval(input: Any): Any =
    TrChecksums.tax(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): TaxNumValid =
    copy(child = newChild)
}

object TrChecksumExpr {
  import org.apache.spark.sql.graft.SqlBridge
  def tcknValid(c: Column): Column = SqlBridge.column(TcknValid(SqlBridge.expression(c)))
  def taxNumValid(c: Column): Column = SqlBridge.column(TaxNumValid(SqlBridge.expression(c)))
}
