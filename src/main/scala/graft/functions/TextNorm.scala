package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native codegen'd expression — the
  * repair step every multilingual dedup/hash pipeline needs BEFORE
  * content fingerprinting: "café" composed (U+00E9) and decomposed
  * (e + U+0301) are byte-different, so md5/minhash/span fingerprints
  * all miss the duplicate until both sides normalize to one form.
  * Spark ships no normalization builtin; a UDF would block codegen —
  * this is the one-method-call expression shape of the checksum
  * validators (SURVEY §3).
  *
  * Forms: NFC (canonical composition — the web/DuckDB default and the
  * gate-checked contract), NFD, NFKC, NFKD (compatibility folding —
  * what search/dedup normalization usually wants: ligatures, width,
  * super/subscripts). Null in → null out. Already-normalized strings
  * short-circuit via `Normalizer.isNormalized` (the common case on
  * ASCII corpora — a cheap scan, no allocation).
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  private val nf = java.text.Normalizer.Form.valueOf(form.toUpperCase)

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expected a string, got $other")
    }

  def norm(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, nf)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, nf))
  }

  override def nullSafeEval(input: Any): Any = norm(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unicodeNormalize", this, classOf[UnicodeNormalize].getName)
    defineCodeGen(ctx, ev, a => s"$ref.norm($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {
  def apply(s: Column, form: String = "NFC"): Column = {
    import org.apache.spark.sql.graft.SqlBridge
    SqlBridge.column(UnicodeNormalize(SqlBridge.expression(s), form))
  }
}
