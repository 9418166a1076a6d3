package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, EOFException,
  InputStream, OutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Native WARC (ISO 28500) source/sink — the canonical web-crawl
  * interchange format a large-scale training-data pipeline ingests
  * (Common Crawl ships ~100 TB/month of `.warc.gz`). The reference
  * ingests CSV/XLSX only (home.py:56-62); this is a forward-looking
  * source in the C20/XLSX mold: no Spark WARC package resolves
  * offline, and none is needed — a WARC file is a sequence of
  * `WARC/1.x` header blocks + `Content-Length`-framed payloads, and
  * the JDK ships the gzip codec.
  *
  * Supported surface:
  *   - plain `.warc` and per-record-gzip-member `.warc.gz` (the
  *     Common Crawl layout; `GZIPInputStream` reads concatenated
  *     members transparently),
  *   - `warcinfo` / `resource` / `response` / any other record type
  *     (type is surfaced as a column, not filtered),
  *   - optional HTTP-message unwrap for `response` records whose
  *     block is `application/http` (status line + headers split off
  *     at the first CRLFCRLF, status code and HTTP `Content-Type`
  *     surfaced as columns).
  *
  * Scale shape: WARC has NO record-level split points — a reader
  * must scan from a record boundary, and `.warc.gz` members are not
  * indexed — so the unit of parallelism is the FILE, exactly how
  * Common Crawl is laid out (segments of ~1 GiB files, tens of
  * thousands per crawl). The reader is `binaryFile` → one task per
  * file → streaming parse; a directory of WARCs parses embarrassingly
  * parallel with zero shuffle, and the practical bound is one file's
  * bytes in one task (keep files ~1 GiB, which the ecosystem already
  * does). The writer mirrors [[Xlsx.writeXlsxPartitioned]]: one WARC
  * file per partition written BY THE EXECUTORS through the same
  * staging + atomic-rename commit protocol — no driver funnel.
  *
  * Record identity is DETERMINISTIC: `WARC-Record-ID` derives from
  * `UUID.nameUUIDFromBytes(uri | date | length)` so a re-export of
  * the same frame is byte-stable (gate- and diff-friendly); crawlers
  * that require globally unique IDs across distinct captures of the
  * same URI at the same second should add a discriminating column to
  * the URI instead.
  */
object Warc {

  val schema: StructType = StructType(Seq(
    StructField("warc_type", StringType),
    StructField("record_id", StringType),
    StructField("target_uri", StringType),
    StructField("warc_date", StringType),
    StructField("content_type", StringType),
    StructField("http_status", IntegerType),
    StructField("http_content_type", StringType),
    StructField("content", BinaryType)))

  /** Read one WARC file or a directory of them into a DataFrame
    * (one row per record; `content` is the raw block, or the HTTP
    * body when `unwrapHttp` and the record is an `application/http`
    * response). One task per file — see the scale note above.
    */
  def readWarc(spark: SparkSession, path: String,
               unwrapHttp: Boolean = true): DataFrame = {
    val bin = StagedCommit.binaryFilesCommitted(spark, path).select("content")
    val rows = bin.rdd.flatMap { r =>
      parseAll(r.getAs[Array[Byte]](0)).map { rec =>
        val (status, httpCt, body) =
          if (unwrapHttp) unwrapHttpResponse(rec) else (null, null, rec.block)
        Row(rec.warcType, rec.recordId, rec.targetUri, rec.date,
          rec.contentType, status, httpCt, body)
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** Distributed export: one `part-<i>.warc[.gz]` PER PARTITION,
    * written by the executors (staging subdir + per-attempt temp
    * name + atomic rename; the previous export survives a failed
    * re-export — the [[Xlsx.writeXlsxPartitioned]] commit protocol).
    * Caller controls file count/size via an upstream
    * `repartition(n)`; keep parts ~1 GiB for downstream read
    * parallelism. Input columns (by name, all others ignored):
    * `target_uri` string, `warc_date` string (ISO-8601, passed
    * through verbatim), `content_type` string, `content` binary.
    * Records are written as `WARC-Type: resource` (raw payload, no
    * HTTP framing) preceded by one `warcinfo` record per file.
    */
  def writeWarcPartitioned(df: DataFrame, dir: String,
                           gzip: Boolean = true,
                           manifest: Boolean = false): Unit = {
    val ext = if (gzip) ".warc.gz" else ".warc"
    val proj = df.select(
      col("target_uri").cast(StringType), col("warc_date").cast(StringType),
      col("content_type").cast(StringType), col("content").cast(BinaryType))
    // stale rule keeps BOTH extensions: flipping `gzip` between
    // exports must still replace the other flavor's parts
    StagedCommit.writePartitioned(proj, dir, ext,
      stale = n => n.startsWith("part-") &&
        (n.endsWith(".warc") || n.endsWith(".warc.gz")),
      manifest = manifest) { (it, out, name) =>
      writeFile(out, gzip, name, it.map { r =>
        (r.getString(0), r.getString(1), r.getString(2),
          if (r.isNullAt(3)) Array.empty[Byte] else r.getAs[Array[Byte]](3))
      })
    }
  }

  /** Driver-streamed single-file export (the [[Xlsx.writeXlsx]]
    * ergonomics sink — one partition in driver memory at a time).
    * Same input contract as [[writeWarcPartitioned]].
    */
  def writeWarc(df: DataFrame, path: String, gzip: Boolean = true): Unit = {
    val proj = df.select(
      col("target_uri").cast(StringType), col("warc_date").cast(StringType),
      col("content_type").cast(StringType), col("content").cast(BinaryType))
    val fs = new java.io.FileOutputStream(path)
    try {
      val it = proj.toLocalIterator()
      writeFile(fs, gzip, new java.io.File(path).getName,
        new Iterator[(String, String, String, Array[Byte])] {
          def hasNext: Boolean = it.hasNext
          def next(): (String, String, String, Array[Byte]) = {
            val r = it.next()
            (r.getString(0), r.getString(1), r.getString(2),
              if (r.isNullAt(3)) Array.empty[Byte] else r.getAs[Array[Byte]](3))
          }
        })
    } finally fs.close()
  }

  // ---------------------------------------------------------------
  // record model + parser
  // ---------------------------------------------------------------

  final case class Record(warcType: String, recordId: String,
                          targetUri: String, date: String,
                          contentType: String, block: Array[Byte])

  private val Gz0 = 0x1f.toByte
  private val Gz1 = 0x8b.toByte

  /** Parse every record in one file's bytes (gzip auto-detected by
    * magic; multi-member streams — the `.warc.gz` layout — read
    * transparently). Malformed framing throws loudly with the byte
    * offset rather than silently resyncing: a crawl file that does
    * not frame is a corrupt input, not a soft skip.
    */
  def parseAll(bytes: Array[Byte]): Iterator[Record] = {
    val in: InputStream =
      if (bytes.length >= 2 && bytes(0) == Gz0 && bytes(1) == Gz1)
        new GZIPInputStream(new ByteArrayInputStream(bytes), 1 << 16)
      else new ByteArrayInputStream(bytes)
    new Iterator[Record] {
      private var nextRec: Record = _
      private var done = false
      private def advance(): Unit = {
        if (!done && nextRec == null) {
          nextRec = readRecord(in).orNull
          if (nextRec == null) done = true
        }
      }
      def hasNext: Boolean = { advance(); !done }
      def next(): Record = {
        advance()
        if (done) throw new NoSuchElementException("past last WARC record")
        val r = nextRec; nextRec = null; r
      }
    }
  }

  /** Read one record (headers + Content-Length-framed block +
    * trailing CRLFCRLF); None at clean EOF. */
  private def readRecord(in: InputStream): Option[Record] = {
    var line = readLine(in)
    // tolerate stray blank lines between records
    while (line != null && line.isEmpty) line = readLine(in)
    if (line == null) return None
    require(line.startsWith("WARC/"),
      s"[graft] Warc: expected a WARC/1.x version line, got '${line.take(40)}'")
    var warcType, recordId, targetUri, date, contentType: String = null
    var contentLength = -1L
    var h = readLine(in)
    while (h != null && h.nonEmpty) {
      val i = h.indexOf(':')
      require(i > 0, s"[graft] Warc: malformed header line '${h.take(60)}'")
      val name = h.substring(0, i).trim.toLowerCase(java.util.Locale.ROOT)
      val value = h.substring(i + 1).trim
      name match {
        case "warc-type" => warcType = value
        case "warc-record-id" => recordId = value
        case "warc-target-uri" => targetUri = value
        case "warc-date" => date = value
        case "content-type" => contentType = value
        case "content-length" => contentLength = value.toLong
        case _ => ()
      }
      h = readLine(in)
    }
    require(h != null, "[graft] Warc: EOF inside a header block")
    require(contentLength >= 0, "[graft] Warc: record without Content-Length")
    require(contentLength <= Int.MaxValue.toLong,
      s"[graft] Warc: $contentLength-byte block exceeds the one-array bound")
    val block = new Array[Byte](contentLength.toInt)
    var off = 0
    while (off < block.length) {
      val n = in.read(block, off, block.length - off)
      if (n < 0) throw new EOFException(
        s"[graft] Warc: EOF at $off of a $contentLength-byte block")
      off += n
    }
    Some(Record(warcType, recordId, targetUri, date, contentType, block))
  }

  /** CRLF (or bare LF) terminated line as ISO-8859-1 (WARC headers
    * are octets; UTF-8 URIs survive the round trip byte-exact).
    * Null at EOF before any byte.
    */
  private def readLine(in: InputStream): String = {
    val buf = new ByteArrayOutputStream(96)
    var c = in.read()
    if (c < 0) return null
    while (c >= 0 && c != '\n') {
      buf.write(c)
      c = in.read()
    }
    val s = new String(buf.toByteArray, java.nio.charset.StandardCharsets.ISO_8859_1)
    if (s.endsWith("\r")) s.substring(0, s.length - 1) else s
  }

  /** Split an `application/http` response block into (status code,
    * HTTP Content-Type, body); anything else passes through with
    * null status columns.
    */
  private def unwrapHttpResponse(rec: Record):
      (Integer, String, Array[Byte]) = {
    val isHttp = rec.warcType == "response" && rec.contentType != null &&
      rec.contentType.toLowerCase(java.util.Locale.ROOT)
        .startsWith("application/http")
    if (!isHttp) return (null, null, rec.block)
    val sep = indexOfCrlfCrlf(rec.block)
    if (sep < 0) return (null, null, rec.block) // headerless — pass through
    val head = new String(rec.block, 0, sep,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val lines = head.split("\r?\n")
    val status: Integer = lines.headOption
      .map(_.split(" ", 3)) match {
      case Some(parts) if parts.length >= 2 && parts(0).startsWith("HTTP/") &&
        parts(1).forall(_.isDigit) && parts(1).nonEmpty => Integer.valueOf(parts(1).toInt)
      case _ => null
    }
    val ct = lines.drop(1).collectFirst {
      case l if l.toLowerCase(java.util.Locale.ROOT).startsWith("content-type:") =>
        l.substring(l.indexOf(':') + 1).trim
    }.orNull
    val body = java.util.Arrays.copyOfRange(rec.block, sep + 4, rec.block.length)
    (status, ct, body)
  }

  private def indexOfCrlfCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  // ---------------------------------------------------------------
  // writer
  // ---------------------------------------------------------------

  private val Crlf = "\r\n".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)

  /** One file: a `warcinfo` record, then one `resource` record per
    * input tuple. With `gzip`, EVERY record is its own gzip member
    * (the Common Crawl layout — a future indexed reader can seek to
    * member offsets).
    */
  /** Per-member gzip stream that can release its native Deflater
    * eagerly. `DeflaterOutputStream`'s deflater field is the Java
    * identifier `def` — reachable from Scala only via backticks. */
  private final class MemberGzip(out: OutputStream)
      extends GZIPOutputStream(out, 1 << 16) {
    def endDeflater(): Unit = `def`.end()
  }

  private def writeFile(out: OutputStream, gzip: Boolean, fileName: String,
                        records: Iterator[(String, String, String, Array[Byte])]): Unit = {
    def emit(headers: Seq[(String, String)], block: Array[Byte]): Unit = {
      val target: OutputStream = if (gzip) new MemberGzip(out) else out
      val sb = new StringBuilder("WARC/1.0\r\n")
      headers.foreach { case (k, v) => sb.append(k).append(": ").append(v).append("\r\n") }
      sb.append("Content-Length: ").append(block.length).append("\r\n\r\n")
      target.write(sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      target.write(block)
      target.write(Crlf); target.write(Crlf)
      target match {
        // close the member, keep `out` open — and release the native
        // Deflater NOW: one is allocated per record, and finish()
        // alone parks it until GC finalization, building invisible
        // native-memory pressure over million-record partitions
        // (ADVICE r13)
        case g: MemberGzip => g.finish(); out.flush(); g.endDeflater()
        case _ => target.flush()
      }
    }
    def uuidOf(parts: String*): String =
      "<urn:uuid:" + java.util.UUID.nameUUIDFromBytes(
        parts.mkString("|").getBytes(java.nio.charset.StandardCharsets.UTF_8)) + ">"
    val info = s"software: graft\r\nisPartOf: $fileName\r\n"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    emit(Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Record-ID" -> uuidOf("warcinfo", fileName),
      "WARC-Date" -> "1970-01-01T00:00:00Z",
      "Content-Type" -> "application/warc-fields"), info)
    records.foreach { case (uri, date, ct, block) =>
      val headers = Seq.newBuilder[(String, String)]
      headers += ("WARC-Type" -> "resource")
      headers += ("WARC-Record-ID" -> uuidOf(
        Option(uri).getOrElse(""), Option(date).getOrElse(""), block.length.toString))
      if (date != null) headers += ("WARC-Date" -> date)
      if (uri != null) headers += ("WARC-Target-URI" -> uri)
      if (ct != null) headers += ("Content-Type" -> ct)
      emit(headers.result(), block)
    }
  }
}
