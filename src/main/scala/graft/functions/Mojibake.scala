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
  * all map back to single bytes under a damage codec AND those bytes
  * decode as STRICT UTF-8, the string was mojibake — replace it with
  * the decode. Damage codecs in fixed priority order (r15, ftfy's
  * ordered-encoding-list move): sloppy Windows-1252 (Latin-1
  * fallback for the 5 unassigned 0x80–0x9F slots — the overwhelmingly
  * common hop), Windows-1251 (Cyrillic pages read with the Russian
  * legacy default), ISO-8859-2 / Latin-2 (Central European). Repeat
  * (bounded at 3 passes) for doubly-encoded text ("ÃƒÂ©" → "Ã©" →
  * "é"). Anything that fails every round trip is returned untouched:
  * genuine Latin-1-alphabet text ("café"), real Cyrillic ("привет"),
  * and real Czech ("žluťoučký") all encode to single-byte images that
  * are NOT valid UTF-8, so they can never be "repaired" into damage
  * (spec-gated per repertoire).
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
      // r15: try the damage codecs in fixed priority order (ftfy's
      // ordered-encoding-list move) — sloppy cp1252 first (the
      // overwhelmingly common hop), then cp1251 (Cyrillic pages read
      // with the Russian legacy default), then latin-2 (Central
      // European). The codecs rarely compete: a damaged string's
      // chars live in the one legacy repertoire that produced them,
      // and where repertoires overlap the byte images — and so the
      // repairs — coincide.
      val decoded = FixMojibake.decodeCandidates(cur)
        .find(d => d != null && d != cur).orNull
      if (decoded == null) pass = 3
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

  /** char → byte reverse table of a single-byte JDK charset, built by
    * decoding each of the 256 bytes (r15 — no hand tables: whatever
    * the JDK decoder produces, including its sloppy control-char
    * mappings for unassigned slots, is by construction the exact
    * inverse of how the damage was read).
    */
  private def buildReverse(name: String): Map[Char, Byte] = {
    val cs = java.nio.charset.Charset.forName(name)
    (0 to 255).flatMap { b =>
      val dec = cs.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      try {
        val s = dec.decode(java.nio.ByteBuffer.wrap(Array(b.toByte))).toString
        if (s.length == 1) Some(s.charAt(0) -> b.toByte) else None
      } catch { case _: java.nio.charset.CharacterCodingException => None }
    }.toMap
  }

  private lazy val Cp1251Reverse: Map[Char, Byte] = buildReverse("windows-1251")
  private lazy val Latin2Reverse: Map[Char, Byte] = buildReverse("ISO-8859-2")

  /** [[toSingleBytes]] under an arbitrary reverse table (strict — a
    * char outside the table means the text can't have come from that
    * codec's single bytes).
    */
  private def toSingleBytesWith(s: String, rev: Map[Char, Byte]): Array[Byte] = {
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      rev.get(s.charAt(i)) match {
        case Some(b) => out(i) = b
        case None => return null
      }
      i += 1
    }
    out
  }

  /** The strict-UTF-8 decodes of the string's byte images under each
    * damage codec, priority order (nulls where a codec can't have
    * produced the string or its bytes aren't UTF-8).
    */
  private[functions] def decodeCandidates(cur: String): Iterator[String] =
    Iterator(
      toSingleBytes(cur),
      toSingleBytesWith(cur, Cp1251Reverse),
      toSingleBytesWith(cur, Latin2Reverse))
      .map(b => if (b == null) null else strictUtf8(b))

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
