package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** International checksum validators as native Catalyst expressions —
  * the same shape as the reference-rooted TR family
  * ([[TrChecksums]]): one static JVM method over the raw UTF8 bytes,
  * codegen emits a single call, the surrounding whole-stage pipeline
  * compiles instantly regardless of how many validators stack in one
  * rule cascade.
  *
  * Both algorithms are public standards: Luhn mod-10 (ISO/IEC 7812 —
  * payment-card PANs; the detection partner of the D18 PII redactor:
  * a 16-digit run that PASSES Luhn is a card number with ~10× the
  * prior of a random digit run) and IBAN mod-97 (ISO 13616).
  * Structure checks are part of validity: Luhn requires 12–19 digits
  * (the PAN length range); IBAN requires 15–34 chars, an alphabetic
  * country code, numeric check digits, and alphanumeric BBAN.
  */
object IntlChecksums {

  /** Luhn mod-10: from the RIGHTMOST digit, double every second
    * digit, subtract 9 from two-digit products, total % 10 == 0.
    */
  def luhn(s: UTF8String): Boolean = {
    if (s == null) return false
    val n = s.numBytes()
    if (n < 12 || n > 19) return false
    val b = s.getBytes
    var i = 0
    while (i < n) { if (b(i) < '0' || b(i) > '9') return false; i += 1 }
    var sum = 0
    var alt = false
    i = n - 1
    while (i >= 0) {
      var d = b(i) - '0'
      if (alt) { d *= 2; if (d > 9) d -= 9 }
      sum += d
      alt = !alt
      i -= 1
    }
    sum % 10 == 0
  }

  /** IBAN mod-97: move the first 4 chars to the end, map A→10..Z→35,
    * and the resulting decimal number must be ≡ 1 (mod 97). The
    * remainder folds left-to-right (·10 or ·100 per char), so no big
    * integer ever materializes.
    */
  def iban(s: UTF8String): Boolean = {
    if (s == null) return false
    val n = s.numBytes()
    if (n < 15 || n > 34) return false
    val b = s.getBytes
    def isUpper(c: Byte) = c >= 'A' && c <= 'Z'
    def isDigit(c: Byte) = c >= '0' && c <= '9'
    if (!isUpper(b(0)) || !isUpper(b(1)) || !isDigit(b(2)) || !isDigit(b(3)))
      return false
    var rem = 0
    var k = 0
    while (k < n) {
      val c = b((k + 4) % n)
      if (isDigit(c)) rem = (rem * 10 + (c - '0')) % 97
      else if (isUpper(c)) rem = (rem * 100 + (c - 'A' + 10)) % 97
      else return false
      k += 1
    }
    rem == 1
  }
}

abstract class IntlChecksumExprBase extends UnaryExpression {
  override def dataType: DataType = BooleanType
  protected def methodName: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.IntlChecksums.$methodName($c)")
}

/** `luhn_valid(str)` — boolean, null iff the input is null. */
case class LuhnValid(child: Expression) extends IntlChecksumExprBase {
  override protected def methodName: String = "luhn"
  override def nullSafeEval(input: Any): Any =
    IntlChecksums.luhn(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): LuhnValid =
    copy(child = newChild)
}

/** `iban_valid(str)` — boolean, null iff the input is null. */
case class IbanValid(child: Expression) extends IntlChecksumExprBase {
  override protected def methodName: String = "iban"
  override def nullSafeEval(input: Any): Any =
    IntlChecksums.iban(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): IbanValid =
    copy(child = newChild)
}

object IntlChecksumExpr {
  import org.apache.spark.sql.graft.SqlBridge
  def luhnValid(c: Column): Column = SqlBridge.column(LuhnValid(SqlBridge.expression(c)))
  def ibanValid(c: Column): Column = SqlBridge.column(IbanValid(SqlBridge.expression(c)))
}
