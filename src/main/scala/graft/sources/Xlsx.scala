package graft.sources

import java.io.{ByteArrayInputStream, InputStream, OutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Minimal native XLSX source/sink (reference: home.py:56-62 ingests
  * Excel via pandas; downloader.py:1-21 exports it). No Spark XLSX
  * package resolves offline — and none is needed: an .xlsx is a ZIP
  * of SpreadsheetML XML parts, and the JDK ships both the ZIP codec
  * and a StAX pull parser. Supported surface: the parts that
  * pandas/openpyxl and this writer emit — shared strings, inline
  * strings, raw numeric/text values, the A1 reference grid with
  * sparse cells.
  *
  * Scale shape: a single workbook is inherently a SMALL artifact
  * (the format caps a sheet at ~1M rows and only parses as one
  * stream), so the reader distributes per FILE: `binaryFile` source,
  * one task per workbook, a directory of workbooks parses in
  * parallel on executors, and the result is an ordinary DataFrame
  * (all-string columns, like CSV without inference — cast
  * downstream with the corrector's typed casts). The writer is a
  * driver-streamed export utility for human-facing extracts — the
  * reference's "download corrected data" button — not a lake format.
  */
object Xlsx {

  /** Read one workbook or a directory of workbooks (first worksheet
    * each) into an all-string DataFrame. With `header = true` the
    * first row of the FIRST workbook names the columns and every
    * workbook's first row is skipped as a header.
    */
  def readXlsx(spark: SparkSession, path: String,
               header: Boolean = true): DataFrame = {
    val bin = StagedCommit.binaryFilesCommitted(spark, path)
      .select("content")
    val head = bin.limit(1).collect() // schema comes from one workbook on the driver
    require(head.nonEmpty, s"no files under $path to derive an xlsx schema from")
    val first = head(0)
    val firstRows = parseSheet(first.getAs[Array[Byte]](0))
    val width = firstRows.headOption.map(_.length).getOrElse(0)
    val names =
      if (header && firstRows.nonEmpty) firstRows.head.map(v => Option(v).getOrElse(""))
      else (0 until width).map(i => s"_c$i")
    val schema = StructType(names.map(n => StructField(n, StringType, nullable = true)))
    val rows = bin.rdd.flatMap { r =>
      val parsed = parseSheet(r.getAs[Array[Byte]](0))
      val data = if (header) parsed.drop(1) else parsed
      data.map { vals =>
        val padded = vals.padTo(width, null).take(width)
        Row.fromSeq(padded)
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** Export up to `maxRows` rows as one workbook (inline strings +
    * raw numerics; values via Row.toString semantics per field).
    * Throws rather than silently truncating past the sheet cap —
    * an export that needs more rows wants a lake format instead.
    *
    * SIZE BOUND (by design): rows stream through the DRIVER via
    * `toLocalIterator` — one partition in memory at a time, so the
    * bound is the 1,048,575-row sheet cap and driver throughput, not
    * driver heap. This mirrors the reference's single-file download
    * (downloader.py); it is an ergonomics sink for human-facing
    * extracts. For bulk export use [[writeXlsxPartitioned]] (one
    * workbook per partition, written BY THE EXECUTORS — no driver
    * funnel) or a lake format.
    */
  def writeXlsx(df: DataFrame, path: String,
                maxRows: Int = 1048575): Unit = {
    val cols = df.columns.toSeq
    val fs = new java.io.FileOutputStream(path)
    try {
      val it = df.toLocalIterator()
      writeWorkbook(fs, cols, new Iterator[Seq[Any]] {
        private var n = 0
        def hasNext: Boolean = it.hasNext
        def next(): Seq[Any] = {
          n += 1
          if (n > maxRows)
            throw new IllegalArgumentException(
              s"xlsx export exceeds $maxRows rows — use parquet/csv for large extracts")
          val r = it.next()
          (0 until r.length).map(i => if (r.isNullAt(i)) null else r.get(i))
        }
      })
    } finally fs.close()
  }

  /** Distributed multi-file export: one workbook PER PARTITION,
    * written by the executors into `dir/part-<i>.xlsx` — the scale
    * path [[writeXlsx]]'s driver-streamed single file is not. Caller
    * controls file count/size via an upstream `repartition(n)`; each
    * partition must respect the per-sheet row cap (enforced — the
    * task throws rather than truncating). `dir` is a Hadoop URI
    * (bare path / `file:` / `hdfs:`; object stores ride the
    * manifest-committed protocol — see [[StagedCommit]]). [[readXlsx]] reads the resulting directory
    * back as one DataFrame.
    *
    * Overwrite semantics, commit-style: tasks write into an
    * underscore-prefixed STAGING subdirectory (invisible to
    * [[readXlsx]] — Spark's hidden-path filter skips `_`/`.` names),
    * each task via a per-attempt temp name + atomic rename so a
    * retried/speculative attempt can never interleave bytes. Only
    * after the whole job succeeds does the driver delete stale
    * `part-*.xlsx` from a previous (possibly wider) export and move
    * the staged parts into place — a FAILED re-export therefore
    * leaves the previous export fully intact (deleting stale parts
    * up front destroyed it and then served a partial directory). The
    * final swap is per-file (not one atomic directory commit): a
    * driver crash mid-swap can leave a mix, but the window is
    * file-moves on one directory, and the staging dir survives for
    * manual recovery.
    */
  def writeXlsxPartitioned(df: DataFrame, dir: String,
                           maxRowsPerFile: Int = 1048575,
                           manifest: Boolean = false): Unit = {
    val cols = df.columns.toSeq
    // r14: rides the shared Hadoop-FS staged-commit protocol (the
    // inline java.io.File copy predated the extraction) — works on
    // file: AND hdfs:/viewfs: staged; object stores manifest-committed
    StagedCommit.writePartitioned(df, dir, ".xlsx",
      manifest = manifest) { (it, out, _) =>
      writeWorkbook(out, cols, new Iterator[Seq[Any]] {
        private var n = 0
        def hasNext: Boolean = it.hasNext
        def next(): Seq[Any] = {
          n += 1
          if (n > maxRowsPerFile)
            throw new IllegalArgumentException(
              s"partition exceeds $maxRowsPerFile rows/sheet — repartition smaller")
          val r = it.next()
          (0 until r.length).map(i => if (r.isNullAt(i)) null else r.get(i))
        }
      })
    }
  }

  // ---------- parsing ----------

  /** First worksheet of a workbook's bytes as rows of cell strings
    * (null = empty cell; trailing gaps not padded — callers pad).
    */
  private[sources] def parseSheet(bytes: Array[Byte]): Seq[Seq[String]] = {
    var shared: IndexedSeq[String] = IndexedSeq.empty
    var sheet: Option[Array[Byte]] = None
    var sharedRaw: Option[Array[Byte]] = None
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        e.getName match {
          case "xl/sharedStrings.xml" => sharedRaw = Some(readAll(zin))
          case n if n.startsWith("xl/worksheets/sheet") && sheet.isEmpty =>
            sheet = Some(readAll(zin))
          case _ => ()
        }
        e = zin.getNextEntry
      }
    } finally zin.close()
    sharedRaw.foreach(b => shared = parseSharedStrings(b))
    sheet.map(parseWorksheet(_, shared)).getOrElse(Seq.empty)
  }

  private def readAll(in: InputStream): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  private def newReader(bytes: Array[Byte]) = {
    val f = XMLInputFactory.newInstance()
    // hygiene: the payload is data, not a place to resolve entities from
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(new ByteArrayInputStream(bytes))
  }

  /** `<si>` items — each the concatenation of its `<t>` runs. */
  private def parseSharedStrings(bytes: Array[Byte]): IndexedSeq[String] = {
    val r = newReader(bytes)
    val items = IndexedSeq.newBuilder[String]
    val cur = new StringBuilder
    var inSi = false
    var inT = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => inSi = true; cur.clear()
            case "t" if inSi => inT = true
            case _ => ()
          }
        case XMLStreamConstants.CHARACTERS if inT => cur.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "t" => inT = false
            case "si" => inSi = false; items += cur.toString
            case _ => ()
          }
        case _ => ()
      }
    }
    r.close()
    items.result()
  }

  /** `<row>`/`<c>` grid. Cell types: `s` shared string, `inlineStr`
    * (`<is><t>`), everything else (`n`, `str`, `b`, untyped) the raw
    * `<v>` text.
    */
  private def parseWorksheet(bytes: Array[Byte],
                             shared: IndexedSeq[String]): Seq[Seq[String]] = {
    val r = newReader(bytes)
    val rows = Seq.newBuilder[Seq[String]]
    var row: scala.collection.mutable.ArrayBuffer[String] = null
    var cellCol = -1
    var cellType = ""
    var inV = false
    var inIsT = false
    val text = new StringBuilder
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" => row = scala.collection.mutable.ArrayBuffer.empty[String]
            case "c" if row != null =>
              cellCol = Option(r.getAttributeValue(null, "r"))
                .map(colIndex).getOrElse(row.length)
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
              text.clear()
            case "v" => inV = true
            case "t" if cellType == "inlineStr" => inIsT = true
            case _ => ()
          }
        case XMLStreamConstants.CHARACTERS if inV || inIsT => text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" => inV = false
            case "t" => inIsT = false
            case "c" if row != null =>
              val raw = text.toString
              val value = cellType match {
                // malformed shared-string index -> null cell, same as
                // the existing out-of-range behavior (shared.lift):
                // one corrupt cell must not kill the workbook's task
                case "s" => raw.trim.toIntOption.flatMap(shared.lift).orNull
                case _ if raw.isEmpty => null
                case _ => raw
              }
              while (row.length < cellCol) row += null // sparse gap
              if (cellCol < row.length) row(cellCol) = value else row += value
            case "row" => rows += row.toSeq; row = null
            case _ => ()
          }
        case _ => ()
      }
    }
    r.close()
    rows.result()
  }

  /** "BC12" → 0-based column 54. Bounded by the SpreadsheetML grid
    * (max column XFD = 16,383): a crafted ref like "ZZZZZZ1" would
    * otherwise drive the sparse-gap padding loop to append hundreds
    * of millions of null cells — a memory bomb from one corrupt/
    * adversarial workbook. Out-of-grid refs fail LOUD (naming the
    * ref) rather than clamping: a ref beyond XFD is not legal
    * SpreadsheetML, so silently remapping it would fabricate data.
    */
  private[sources] def colIndex(ref: String): Int = {
    val letters = ref.takeWhile(_.isLetter)
    require(letters.nonEmpty && letters.length <= 3,
      s"cell ref '$ref' is outside the SpreadsheetML A1 grid (max column XFD)")
    val i = letters.foldLeft(0)((a, c) => a * 26 + (c.toUpper - 'A' + 1)) - 1
    require(i <= 16383,
      s"cell ref '$ref' is outside the SpreadsheetML A1 grid (max column XFD)")
    i
  }

  // ---------- writing ----------

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c if c < ' ' && c != '\t' && c != '\n' && c != '\r' => ""
      case c => c.toString
    }

  private def colRef(i: Int): String = {
    var n = i + 1
    val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  private def writeWorkbook(out: OutputStream, cols: Seq[String],
                            rows: Iterator[Seq[Any]]): Unit = {
    val z = new ZipOutputStream(out)
    def entry(name: String, content: String): Unit = {
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    entry("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |</Types>""".stripMargin)
    entry("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin)
    entry("xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
        |</workbook>""".stripMargin)
    entry("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin)

    z.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
    def w(s: String): Unit = z.write(s.getBytes("UTF-8"))
    w("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    w("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    def writeRow(rowNum: Int, vals: Seq[Any]): Unit = {
      w(s"""<row r="$rowNum">""")
      vals.zipWithIndex.foreach { case (v, i) =>
        val ref = colRef(i) + rowNum
        v match {
          case null => () // sparse: emit nothing for nulls
          case n: Byte => w(s"""<c r="$ref"><v>$n</v></c>""")
          case n: Short => w(s"""<c r="$ref"><v>$n</v></c>""")
          case n: Int => w(s"""<c r="$ref"><v>$n</v></c>""")
          case n: Long => w(s"""<c r="$ref"><v>$n</v></c>""")
          case n: Float => w(s"""<c r="$ref"><v>$n</v></c>""")
          case n: Double => w(s"""<c r="$ref"><v>$n</v></c>""")
          case n: java.math.BigDecimal => w(s"""<c r="$ref"><v>$n</v></c>""")
          case other =>
            w(s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${xmlEscape(other.toString)}</t></is></c>""")
        }
      }
      w("</row>")
    }
    writeRow(1, cols)
    var rn = 2
    rows.foreach { vals => writeRow(rn, vals); rn += 1 }
    w("</sheetData></worksheet>")
    z.closeEntry()
    z.finish()
  }
}
