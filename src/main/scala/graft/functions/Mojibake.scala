package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** C34: mojibake repair (the ftfy `fix_encoding` core as a native
  * codegen'd expression) — the encoding-damage repair every web-crawl
  * cleaning pipeline runs before anything hashes text: a UTF-8
  * document read once as Windows-1252/Latin-1 and re-saved turns
  * "don’t" into "donâ€™t" and "café" into "cafÃ©", and every
  * fingerprint/dedup/langid signal downstream sees garbage.
  *
  * Algorithm (the standard round-trip test): if the string's chars
  * all map back to single bytes under Windows-1252 (falling back to
  * Latin-1 for the 0x80–0x9F codepoints cp1252 leaves unmapped) AND
  * those bytes decode as STRICT UTF-8, the string was mojibake —
  * replace it with the decode. Repeat (bounded at 3 passes) for
  * doubly-encoded text ("ÃƒÂ©" → "Ã©" → "é"). Anything that fails
  * either test is returned untouched: genuine Latin-1-alphabet text
  * ("café") encodes to bytes that are NOT valid UTF-8, so it can
  * never be "repaired" into damage.
  *
  * Honest ambiguity contract (ftfy's own): a human who really typed
  * the literal characters "Ã©" is indistinguishable from the
  * mojibake for "é" — this expression takes the mojibake reading,
  * because at web scale that reading is right overwhelmingly often.
  * Detection is `FixMojibake(c) =!= c` (scan-local, codegen'd);
  * repair is the expression itself. Null in → null out.
  */
case class FixMojibake(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expected a string, got $other")
    }

  def fix(s: UTF8String): UTF8String = {
    var cur = s.toString
    var pass = 0
    var changed = false
    while (pass < 3) {
      val bytes = FixMojibake.toSingleBytes(cur)
      val decoded = if (bytes == null) null else FixMojibake.strictUtf8(bytes)
      if (decoded == null || decoded == cur) pass = 3
      else { cur = decoded; changed = true; pass += 1 }
    }
    if (changed) UTF8String.fromString(cur) else s
  }

  override def nullSafeEval(input: Any): Any = fix(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("fixMojibake", this, classOf[FixMojibake].getName)
    defineCodeGen(ctx, ev, a => s"$ref.fix($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): FixMojibake =
    copy(child = newChild)
}

object FixMojibake {

  /** The Windows-1252 byte for each of the 27 codepoints cp1252 maps
    * into 0x80–0x9F (the other 5 slots are unassigned and fall back
    * to the Latin-1 identity). Everything ≤ 0xFF maps to itself.
    */
  private val Cp1252Reverse: Map[Char, Byte] = Map(
    '€' -> 0x80, '‚' -> 0x82, 'ƒ' -> 0x83, '„' -> 0x84,
    '…' -> 0x85, '†' -> 0x86, '‡' -> 0x87, 'ˆ' -> 0x88,
    '‰' -> 0x89, 'Š' -> 0x8A, '‹' -> 0x8B, 'Œ' -> 0x8C,
    'Ž' -> 0x8E, '‘' -> 0x91, '’' -> 0x92, '“' -> 0x93,
    '”' -> 0x94, '•' -> 0x95, '–' -> 0x96, '—' -> 0x97,
    '˜' -> 0x98, '™' -> 0x99, 'š' -> 0x9A, '›' -> 0x9B,
    'œ' -> 0x9C, 'ž' -> 0x9E, 'Ÿ' -> 0x9F)
    .map { case (c, b) => c -> b.toByte }

  /** The string's chars as the single bytes a cp1252 (+ Latin-1
    * 0x80–0x9F fallback — "sloppy cp1252", what ftfy uses, because
    * real decoders pass those control bytes through) reader would
    * have produced them FROM; null when some char can't have come
    * from a single byte (genuinely multi-byte text — not mojibake).
    */
  private[functions] def toSingleBytes(s: String): Array[Byte] = {
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c <= 'ÿ') out(i) = c.toByte
      else Cp1252Reverse.get(c) match {
        case Some(b) => out(i) = b
        case None => return null
      }
      i += 1
    }
    out
  }

  /** Strict UTF-8 decode — null on ANY malformed/unmappable sequence
    * (the default JDK decode silently substitutes U+FFFD, which would
    * "repair" non-mojibake into damage). Pure-ASCII input decodes to
    * an IDENTICAL string, which the fix loop reads as "stop" — so
    * clean ASCII costs one cheap pass and is never rewritten.
    */
  private[functions] def strictUtf8(bytes: Array[Byte]): String = {
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
    catch { case _: java.nio.charset.CharacterCodingException => null }
  }

  def apply(s: Column): Column = {
    import org.apache.spark.sql.graft.SqlBridge
    SqlBridge.column(FixMojibake(SqlBridge.expression(s)))
  }
}
