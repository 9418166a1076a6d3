package graft.sources

import java.io.{ByteArrayInputStream, InputStream, OutputStream}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** D92: WebDataset-style tar shard sink/source — the convention
  * multimodal training dataloaders standardized on (a directory of
  * `.tar` shards; inside each, files named `<key>.<ext>` where every
  * file sharing a key is one SAMPLE: `000123.jpg` + `000123.txt` +
  * `000123.json`). Shards are the sequential-read unit: a loader
  * streams whole tars at object-store line speed instead of issuing
  * one ranged GET per tiny file — which is the entire reason the
  * format exists, and exactly the property a Spark EXPORT should
  * preserve: one tar per partition, written by the executors.
  *
  * Pure-JDK ustar: 512-byte headers (name/mode/size/chksum/magic),
  * payload padded to 512, two zero blocks at EOF. Every header
  * field that could vary is PINNED (mtime 0, mode 0644, uid/gid 0)
  * so a re-export of the same frame is byte-identical — the C28
  * determinism contract. Member names are capped at the ustar
  * 100-char name field; longer keys throw loudly rather than
  * silently engaging GNU longlink extensions a minimal loader may
  * not parse.
  *
  * Scale shape: the same FILE-parallel story as [[Warc]] — tars
  * have no record-level split points; `binaryFile` → one task per
  * shard → streaming parse; caller sizes shards via an upstream
  * `repartition(n)` (the ecosystem convention is ~1 GiB /
  * ~10k samples per shard).
  */
object TarShards {

  val schema: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("files", MapType(StringType, BinaryType))))

  /** Distributed export: `dir/shard-<i>.tar` per partition through
    * the staging + atomic-rename commit protocol. Input columns:
    * `keyCol` string (sample key, ≤ 90 chars), `filesCol`
    * map<string ext, binary payload>. Null payloads are skipped;
    * a null key throws (a sample must be addressable).
    */
  def writeTarShards(df: DataFrame, dir: String, keyCol: String = "key",
                     filesCol: String = "files",
                     manifest: Boolean = false): Unit = {
    val proj = df.select(col(keyCol).cast(StringType).as("key"),
      col(filesCol).cast(MapType(StringType, BinaryType)).as("files"))
    // r14: rides the shared Hadoop-FS staged-commit protocol (the
    // inline java.io.File copy predated the extraction); shard names
    // keep the zero-padded `shard-` convention so path-ordered
    // loaders see the partition order
    StagedCommit.writePartitioned(proj, dir, ".tar",
      stale = n => n.startsWith("shard-") && n.endsWith(".tar"),
      partName = pid => f"shard-$pid%06d.tar",
      manifest = manifest) { (it, out, _) =>
      it.foreach { r =>
        require(!r.isNullAt(0), "[graft] TarShards: null sample key")
        val key = r.getString(0)
        // WebDataset splits member names at the FIRST dot, so a
        // dotted key would silently migrate into the extension on
        // read-back ('a.b' + 'txt' → key 'a', ext 'b.txt') —
        // refuse loudly, like the 100-byte name check (ADVICE r13)
        require(!key.contains('.'),
          s"[graft] TarShards: key '$key' contains '.' — WebDataset member " +
            "names split key from extension at the first dot")
        val files = r.getMap[String, Array[Byte]](1)
        files.toSeq.sortBy(_._1).foreach { case (ext, payload) =>
          if (payload != null) writeEntry(out, s"$key.$ext", payload)
        }
      }
      out.write(new Array[Byte](1024)) // two zero blocks = EOF
    }
  }

  /** Read a shard directory (or one tar) back: one row per SAMPLE —
    * (key, map<ext, payload>). One task per shard. */
  def readTarShards(spark: SparkSession, path: String): DataFrame = {
    val bin = StagedCommit.binaryFilesCommitted(spark, path).select("content")
    val rows = bin.rdd.flatMap { r =>
      val entries = parseTar(r.getAs[Array[Byte]](0))
      // group `<key>.<ext>` members into samples; keep first-seen
      // key order (the shard's sample order is meaningful to loaders)
      val order = scala.collection.mutable.LinkedHashMap
        .empty[String, scala.collection.mutable.Builder[(String, Array[Byte]), Map[String, Array[Byte]]]]
      entries.foreach { case (name, payload) =>
        val dot = name.indexOf('.')
        val (key, ext) = if (dot < 0) (name, "") else (name.substring(0, dot), name.substring(dot + 1))
        order.getOrElseUpdate(key, Map.newBuilder[String, Array[Byte]]) += (ext -> payload)
      }
      order.iterator.map { case (key, b) => Row(key, b.result()) }
    }
    spark.createDataFrame(rows, schema)
  }

  // ---------------------------------------------------------------

  private def writeEntry(out: OutputStream, name: String, payload: Array[Byte]): Unit = {
    val nameBytes = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    require(nameBytes.length <= 100,
      s"[graft] TarShards: member name '$name' exceeds the 100-byte ustar field — " +
        "shorten the sample key (GNU longlink extensions stay out of scope)")
    val h = new Array[Byte](512)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      System.arraycopy(b, 0, h, off, b.length)
    }
    System.arraycopy(nameBytes, 0, h, 0, nameBytes.length)
    put(100, "0000644\u0000")                     // mode
    put(108, "0000000\u0000")                     // uid
    put(116, "0000000\u0000")                     // gid
    put(124, f"${payload.length}%011o" + "\u0000") // size, octal
    put(136, "00000000000\u0000")                 // mtime 0 — pinned
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum field = spaces for the sum
    h(156) = '0'                                  // typeflag: regular file
    put(257, "ustar\u0000")
    put(263, "00")
    val chk = h.foldLeft(0)((a, b) => a + (b & 0xff))
    put(148, f"$chk%06o" + "\u0000 ")
    out.write(h)
    out.write(payload)
    val pad = (512 - payload.length % 512) % 512
    if (pad > 0) out.write(new Array[Byte](pad))
  }

  /** All (name, payload) members of one tar; loud on malformed
    * headers (bad magic / checksum), clean stop at the zero block. */
  def parseTar(bytes: Array[Byte]): Seq[(String, Array[Byte])] =
    parseTarStream(new ByteArrayInputStream(bytes))

  private def parseTarStream(in: InputStream): Seq[(String, Array[Byte])] = {
    val out = Seq.newBuilder[(String, Array[Byte])]
    val h = new Array[Byte](512)
    var done = false
    while (!done) {
      var off = 0
      var eof = false
      while (off < 512 && !eof) {
        val n = in.read(h, off, 512 - off)
        if (n < 0) eof = true else off += n
      }
      if (eof && off == 0) done = true
      else {
        require(off == 512, s"[graft] TarShards: truncated header ($off bytes)")
        if (h.forall(_ == 0)) done = true // zero block = EOF marker
        else {
          val magic = new String(h, 257, 5, java.nio.charset.StandardCharsets.US_ASCII)
          require(magic == "ustar",
            s"[graft] TarShards: bad magic '$magic' — not a ustar archive")
          val stored = new String(h, 148, 8, java.nio.charset.StandardCharsets.US_ASCII)
            .replace("\u0000", "").trim
          val copy = h.clone()
          java.util.Arrays.fill(copy, 148, 156, ' '.toByte)
          val computed = copy.foldLeft(0)((a, b) => a + (b & 0xff))
          require(stored.nonEmpty && java.lang.Integer.parseInt(stored, 8) == computed,
            s"[graft] TarShards: header checksum mismatch (stored $stored, computed ${computed.toOctalString})")
          val nameLen = { var i = 0; while (i < 100 && h(i) != 0) i += 1; i }
          val name = new String(h, 0, nameLen, java.nio.charset.StandardCharsets.UTF_8)
          val sizeStr = new String(h, 124, 12, java.nio.charset.StandardCharsets.US_ASCII)
            .replace("\u0000", "").trim
          val size = java.lang.Long.parseLong(sizeStr, 8)
          require(size <= Int.MaxValue.toLong,
            s"[graft] TarShards: $size-byte member exceeds the one-array bound")
          val payload = new Array[Byte](size.toInt)
          var p = 0
          while (p < payload.length) {
            val n = in.read(payload, p, payload.length - p)
            require(n >= 0, s"[graft] TarShards: EOF at $p of a $size-byte member")
            p += n
          }
          val pad = (512 - size % 512) % 512
          var skipped = 0L
          while (skipped < pad) {
            val n = in.skip(pad - skipped)
            require(n > 0, "[graft] TarShards: EOF inside padding")
            skipped += n
          }
          // typeflag '0'/NUL = regular file; anything else (dirs,
          // links, pax headers) is skipped, not an error
          if (h(156) == '0' || h(156) == 0) { out += (name -> payload); () }
        }
      }
    }
    out.result()
  }
}
