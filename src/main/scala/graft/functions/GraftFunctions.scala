package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration of graft's native expressions as SQL functions.
  *
  * Two paths:
  *  - config `spark.sql.extensions=graft.functions.GraftExtensions`
  *    at session build time (the standard extension mechanism);
  *  - [[GraftFunctions.register]] on an already-running session.
  */
object UnicodeNormalizeBuilder {
  /** `unicode_normalize(s[, form])` — form must be a foldable string
    * literal (NFC default): the normalizer form is part of the plan,
    * not per-row data.
    */
  def apply(children: Seq[Expression]): Expression = children match {
    case Seq(c) => UnicodeNormalize(c, "NFC")
    case Seq(c, org.apache.spark.sql.catalyst.expressions.Literal(f, _)) if f != null =>
      UnicodeNormalize(c, f.toString)
    case _ => throw new IllegalArgumentException(
      "unicode_normalize(col[, 'NFC'|'NFD'|'NFKC'|'NFKD']): form must be a string literal")
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // opt-in naive-range-join rewrite (no-op unless
    // spark.graft.rangeJoin.bucketWidth is set — see RangeJoinRule)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRule)
    ext.injectFunction((
      FunctionIdentifier("unicode_normalize"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName, "unicode_normalize"),
      (children: Seq[Expression]) => UnicodeNormalizeBuilder(children)))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("tckn_valid"),
      new ExpressionInfo(classOf[TcknValid].getName, "tckn_valid"),
      (children: Seq[Expression]) => TcknValid(children.head)))
    ext.injectFunction((
      FunctionIdentifier("taxnum_valid"),
      new ExpressionInfo(classOf[TaxNumValid].getName, "taxnum_valid"),
      (children: Seq[Expression]) => TaxNumValid(children.head)))
    ext.injectFunction((
      FunctionIdentifier("luhn_valid"),
      new ExpressionInfo(classOf[LuhnValid].getName, "luhn_valid"),
      (children: Seq[Expression]) => LuhnValid(children.head)))
    ext.injectFunction((
      FunctionIdentifier("iban_valid"),
      new ExpressionInfo(classOf[IbanValid].getName, "iban_valid"),
      (children: Seq[Expression]) => IbanValid(children.head)))
  }
}

object GraftFunctions {
  /** Idempotently registers graft SQL functions on a live session, so
    * `spark.sql("SELECT dot_product(a, b) ...")` works without
    * rebuilding the session with extensions.
    */
  def register(spark: SparkSession): Unit = {
    org.apache.spark.sql.graft.SqlBridge.registerFunction(
      spark, "dot_product", (children: Seq[Expression]) => DotProduct(children(0), children(1)))
    org.apache.spark.sql.graft.SqlBridge.registerFunction(
      spark, "tckn_valid", (children: Seq[Expression]) => TcknValid(children.head))
    org.apache.spark.sql.graft.SqlBridge.registerFunction(
      spark, "taxnum_valid", (children: Seq[Expression]) => TaxNumValid(children.head))
    org.apache.spark.sql.graft.SqlBridge.registerFunction(
      spark, "luhn_valid", (children: Seq[Expression]) => LuhnValid(children.head))
    org.apache.spark.sql.graft.SqlBridge.registerFunction(
      spark, "iban_valid", (children: Seq[Expression]) => IbanValid(children.head))
    org.apache.spark.sql.graft.SqlBridge.registerFunction(
      spark, "unicode_normalize",
      (children: Seq[Expression]) => UnicodeNormalizeBuilder(children))
    // live-session parity for the extensions-injected optimizer rule
    // (still a no-op until spark.graft.rangeJoin.bucketWidth is set)
    if (!spark.experimental.extraOptimizations.contains(graft.plans.RangeJoinRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.RangeJoinRule
  }
}
