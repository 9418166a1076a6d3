package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** The executor-side commit protocols shared by the one-file-per-
  * partition sinks (Avro, WARC, tar shards, partitioned XLSX; the
  * single-file Xlsx is a driver-streamed export and stages inline).
  * Two protocols, auto-selected by the destination's capabilities:
  *
  * 1. STAGED (r14, schemes with ATOMIC rename — `file:` on a shared
  *    mount, `hdfs:`, `viewfs:`): each non-empty partition writes
  *    `part-<pid><ext>` into a `_staging-<uuid>` subdir via a
  *    per-attempt temp name + atomic rename (task retries can never
  *    interleave bytes), then the driver swaps staging into place —
  *    deleting stale parts first — only after every task succeeded,
  *    so a failed re-export leaves the previous export intact.
  *
  * 2. MANIFEST (r15, everything else — notably the object stores
  *    s3a/gs/abfs/wasb, where rename = copy+delete and the staged
  *    protocol would tear): the protocol never renames. Each task
  *    writes a UNIQUE part name (`<stem>-c<commit>-a<attempt><ext>`)
  *    directly into the destination — creating a new object is the
  *    one primitive every store performs atomically (a PUT either
  *    fully exists or doesn't) — and returns its name to the driver
  *    through the task-result channel, so the driver learns exactly
  *    one winning attempt per partition (Spark reports one successful
  *    result per partition; a losing speculative attempt's file is an
  *    orphan the manifest never lists). The driver then COMMITS by
  *    writing `_graft_manifest.json` naming the winner files — the
  *    single atomic publication point — and only afterwards deletes
  *    files the new manifest does not list (previous generations and
  *    this commit's losing attempts). A crash before the manifest
  *    write leaves the previous export fully intact and readable.
  *
  * READERS trust the manifest when one exists ([[binaryFilesCommitted]]
  * — the WARC/tar/Avro/XLSX read path): directory listing on an
  * object store is only eventually consistent with the writes, and a
  * listing cannot distinguish committed parts from a concurrent
  * writer's in-flight uniques — the manifest can. Dirs without a
  * manifest (staged-protocol exports) fall back to plain listing,
  * which is correct there because the staged commit leaves no
  * uncommitted names behind.
  *
  * Post-commit GC races a reader that resolved the PREVIOUS manifest
  * (its files are deleted under it) — the price of a single-pointer
  * layout. Readers needing snapshot isolation use the versioned
  * [[SnapshotLog]], which keeps every committed generation until an
  * explicit vacuum.
  */
object StagedCommit {

  /** The commit marker + file list a manifest-committed dir publishes. */
  val ManifestName = "_graft_manifest.json"

  /** Hadoop `Configuration` is not `java.io.Serializable`; ship it to
    * executors via its own Writable contract (the standard wrapper
    * pattern, on public Hadoop API).
    */
  private final class SerializableHadoopConf(
      @transient var value: org.apache.hadoop.conf.Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new org.apache.hadoop.conf.Configuration(false)
      value.readFields(in)
    }
  }

  /** Schemes with an atomic `rename` — the staged protocol's
    * load-bearing primitive. Everything else routes to the manifest
    * protocol, which never renames.
    */
  private val AtomicRenameSchemes = Set("file", "hdfs", "viewfs")

  private def qualified(dir: String,
                        conf: org.apache.hadoop.conf.Configuration)
      : org.apache.hadoop.fs.Path = {
    val raw = new org.apache.hadoop.fs.Path(dir)
    val fs = raw.getFileSystem(conf)
    fs.makeQualified(raw)
  }

  private def hasAtomicRename(p: org.apache.hadoop.fs.Path): Boolean =
    Option(p.toUri.getScheme).exists(AtomicRenameSchemes)

  /** Run `writePart(rows, out, partName)` for every non-empty
    * partition (`partName` is the committed file name, for formats
    * that embed it; `out` is closed by the protocol after the
    * callback returns) and commit the results into `dir`. `stale`
    * decides which pre-existing files the commit replaces (default:
    * `part-*<ext>`); `partName` overrides the committed file name
    * per partition id (default `part-<pid><ext>`). Protocol is
    * selected by the destination scheme (staged on atomic-rename
    * stores, manifest elsewhere); `manifest = true` forces the
    * manifest protocol anywhere — the round-trip gates run it on
    * `file:` so the manifest read path is exercised continuously.
    */
  def writePartitioned(df: DataFrame, dir: String, ext: String,
                       stale: String => Boolean = null,
                       partName: Int => String = null,
                       manifest: Boolean = false)
                      (writePart: (Iterator[Row], java.io.OutputStream, String) => Unit): Unit = {
    val isStale: String => Boolean =
      if (stale != null) stale
      else n => n.startsWith("part-") && n.endsWith(ext)
    val nameOf: Int => String =
      if (partName != null) partName else pid => s"part-$pid$ext"
    val hconf = df.sparkSession.sparkContext.hadoopConfiguration
    val d = qualified(dir, hconf)
    if (manifest || !hasAtomicRename(d))
      writeManifested(df, d, ext, isStale, nameOf)(writePart)
    else
      writeStaged(df, d, ext, isStale, nameOf)(writePart)
  }

  // ---------------------------------------------------------------
  // staged protocol (atomic-rename schemes)
  // ---------------------------------------------------------------

  private def writeStaged(df: DataFrame, d: org.apache.hadoop.fs.Path,
                          ext: String, isStale: String => Boolean,
                          nameOf: Int => String)
                         (writePart: (Iterator[Row], java.io.OutputStream, String) => Unit): Unit = {
    val hconf = df.sparkSession.sparkContext.hadoopConfiguration
    val fs = d.getFileSystem(hconf)
    fs.mkdirs(d)
    val staging = new org.apache.hadoop.fs.Path(d,
      s"_staging-${java.util.UUID.randomUUID()}")
    fs.mkdirs(staging)
    val stagingUri = staging.toUri.toString
    val shipConf = new SerializableHadoopConf(hconf)
    var committed = false
    try {
      df.foreachPartition { (it: Iterator[Row]) =>
        if (it.hasNext) {
          val tc = org.apache.spark.TaskContext.get()
          val pid = tc.partitionId()
          val name = nameOf(pid)
          val conf = shipConf.value
          val stg = new org.apache.hadoop.fs.Path(stagingUri)
          val efs = stg.getFileSystem(conf)
          val tmp = new org.apache.hadoop.fs.Path(stg,
            s"$name.tmp-${tc.taskAttemptId()}")
          val dst = new org.apache.hadoop.fs.Path(stg, name)
          try {
            val out = efs.create(tmp, true)
            try writePart(it, out, name) finally out.close()
            val fc = org.apache.hadoop.fs.FileContext.getFileContext(
              stg.toUri, conf)
            fc.rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
            ()
          } finally {
            if (efs.exists(tmp)) { efs.delete(tmp, false) }; ()
          }
        }
      }
      // also drop a leftover _graft_manifest.json: if this dir was
      // previously manifest-committed, the staged swap deletes the old
      // unique parts (they match the stale rule) but a surviving
      // manifest would keep naming them — readers trust the manifest
      // when one exists, so a stale one serves deleted paths (r15
      // advice #1). A staged-protocol dir must carry no manifest.
      Option(fs.listStatus(d)).getOrElse(Array.empty).foreach { st =>
        val n = st.getPath.getName
        if (st.isFile && (isStale(n) || n == ManifestName)) {
          fs.delete(st.getPath, false); ()
        }
      }
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(d.toUri, hconf)
      Option(fs.listStatus(staging)).getOrElse(Array.empty).foreach { st =>
        fc.rename(st.getPath,
          new org.apache.hadoop.fs.Path(d, st.getPath.getName),
          org.apache.hadoop.fs.Options.Rename.OVERWRITE)
        ()
      }
      committed = true
    } finally {
      if (committed) { fs.delete(staging, true); () }
      else System.err.println(
        s"[graft] staged export to $d failed; partial staging left at $staging")
    }
  }

  // ---------------------------------------------------------------
  // manifest protocol (rename-free; required on object stores)
  // ---------------------------------------------------------------

  private def writeManifested(df: DataFrame, d: org.apache.hadoop.fs.Path,
                              ext: String, isStale: String => Boolean,
                              nameOf: Int => String)
                             (writePart: (Iterator[Row], java.io.OutputStream, String) => Unit): Unit = {
    val hconf = df.sparkSession.sparkContext.hadoopConfiguration
    val fs = d.getFileSystem(hconf)
    fs.mkdirs(d)
    val commit = java.util.UUID.randomUUID().toString.replace("-", "")
    val dirUri = d.toUri.toString
    val shipConf = new SerializableHadoopConf(hconf)
    // tasks create their UNIQUE final name directly (no staging, no
    // rename) and report it back; the collect sees exactly one
    // successful attempt per partition — that name goes in the manifest
    val entries = df.rdd.mapPartitionsWithIndex { (pid, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        val tc = org.apache.spark.TaskContext.get()
        val base = nameOf(pid)
        val stem = if (base.endsWith(ext)) base.dropRight(ext.length) else base
        val name = s"$stem-c$commit-a${tc.taskAttemptId()}$ext"
        val conf = shipConf.value
        val dp = new org.apache.hadoop.fs.Path(dirUri)
        val efs = dp.getFileSystem(conf)
        val dst = new org.apache.hadoop.fs.Path(dp, name)
        val out = efs.create(dst, true)
        try writePart(it, out, name) finally out.close()
        Iterator.single((pid, name, efs.getFileStatus(dst).getLen))
      }
    }.collect().sortBy(_._1)
    val prev = readManifestNames(fs, d).getOrElse(Seq.empty).toSet
    writeManifestFile(fs, d, hconf, manifestJson(commit, ext, entries.toIndexedSeq))
    // GC only AFTER the new manifest is live: previous generations,
    // legacy staged-protocol parts, and this commit's losing attempts
    val keep = entries.map(_._2).toSet + ManifestName
    Option(fs.listStatus(d)).getOrElse(Array.empty).foreach { st =>
      val n = st.getPath.getName
      if (st.isFile && !keep(n) && (isStale(n) || prev(n))) {
        fs.delete(st.getPath, false); ()
      }
    }
  }

  private def manifestJson(commit: String, ext: String,
                           entries: Seq[(Int, String, Long)]): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("format", "graft-manifest-v1")
    root.put("commit", commit)
    root.put("ext", ext)
    val arr = root.putArray("files")
    entries.foreach { case (pid, name, bytes) =>
      val f = arr.addObject()
      f.put("partition", pid); f.put("name", name); f.put("bytes", bytes)
      ()
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  /** Publish the manifest: tmp + atomic rename where rename IS atomic
    * (a reader must never see a torn manifest); direct create
    * elsewhere — object-store PUT is atomic (the object appears fully
    * written or not at all), which is the entire premise.
    */
  private def writeManifestFile(fs: org.apache.hadoop.fs.FileSystem,
                                d: org.apache.hadoop.fs.Path,
                                hconf: org.apache.hadoop.conf.Configuration,
                                json: String): Unit = {
    val mf = new org.apache.hadoop.fs.Path(d, ManifestName)
    val bytes = json.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (hasAtomicRename(d)) {
      val tmp = new org.apache.hadoop.fs.Path(d,
        s"_$ManifestName.tmp-${java.util.UUID.randomUUID()}")
      val out = fs.create(tmp, true)
      try out.write(bytes) finally out.close()
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(d.toUri, hconf)
      fc.rename(tmp, mf, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      ()
    } else {
      val out = fs.create(mf, true)
      try out.write(bytes) finally out.close()
    }
  }

  private def readManifestNames(fs: org.apache.hadoop.fs.FileSystem,
                                d: org.apache.hadoop.fs.Path): Option[Seq[String]] = {
    val mf = new org.apache.hadoop.fs.Path(d, ManifestName)
    if (!fs.exists(mf)) None
    else {
      val in = fs.open(mf)
      val bytes =
        try {
          val bos = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var n = in.read(buf)
          while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
          bos.toByteArray
        } finally in.close()
      val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(bytes)
      require(root.path("format").asText() == "graft-manifest-v1",
        s"[graft] unrecognized manifest format in $mf")
      val it = root.path("files").elements()
      val names = Seq.newBuilder[String]
      while (it.hasNext) names += it.next().path("name").asText()
      Some(names.result())
    }
  }

  /** The committed file paths under `dir`: the manifest's list when
    * one exists (the only names a manifest-committed dir guarantees
    * complete — a plain listing also surfaces losing attempts and
    * in-flight writers), or None for a file / staged-protocol dir.
    */
  def committedFiles(spark: SparkSession, dir: String): Option[Seq[String]] = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val d = qualified(dir, hconf)
    val fs = d.getFileSystem(hconf)
    val isDir =
      try fs.getFileStatus(d).isDirectory
      catch { case _: java.io.FileNotFoundException => false }
    if (!isDir) None
    else readManifestNames(fs, d).map(_.map(n =>
      new org.apache.hadoop.fs.Path(d, n).toString))
  }

  private val BinaryFileSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("path",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("modificationTime",
      org.apache.spark.sql.types.TimestampType),
    org.apache.spark.sql.types.StructField("length",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("content",
      org.apache.spark.sql.types.BinaryType)))

  /** `binaryFile` read that TRUSTS the manifest when the dir has one
    * (exactly the committed files — orphan attempts and concurrent
    * writers invisible), falling back to plain listing for files and
    * staged-protocol dirs. The shared read front of the WARC / tar /
    * Avro / XLSX sources.
    */
  def binaryFilesCommitted(spark: SparkSession, path: String): DataFrame =
    committedFiles(spark, path) match {
      case Some(files) if files.nonEmpty =>
        spark.read.format("binaryFile").load(files: _*)
      case Some(_) =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row], BinaryFileSchema)
      case None =>
        spark.read.format("binaryFile").load(path)
    }
}
