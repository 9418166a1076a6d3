package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles as ONE native expression. The
  * Column-level formulation (`transform(sequence(...), slice +
  * concat_ws)`) runs INTERPRETED per row — Spark's higher-order array
  * functions have no codegen — which makes shingling the slowest part
  * of a decontamination or MinHash scan. Semantics are bit-identical
  * to the Column version: split on " +" (Java split, -1 limit, same
  * as Spark's `split`), shingles of `n` consecutive words clamped at
  * the tail (documents shorter than `n` words contribute their whole
  * word sequence as one shingle), distinct in first-occurrence order.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 2, "use array_distinct(split(...)) for 1-grams — it is already codegen'd")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  def shingles(input: Any): GenericArrayData = {
    val words = input.asInstanceOf[UTF8String].toString.split(" +", -1)
    val starts = math.max(words.length - n, 0)
    val seen = new java.util.LinkedHashSet[String]((starts + 1) * 2)
    var i = 0
    while (i <= starts) {
      val end = math.min(i + n, words.length)
      val sb = new java.lang.StringBuilder
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(words(j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = shingles(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordShingles", this, classOf[WordShingles].getName)
    defineCodeGen(ctx, ev, s => s"$ref.shingles($s)")
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  def apply(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graft.SqlBridge
    SqlBridge.column(WordShingles(SqlBridge.expression(text), n))
  }
}
