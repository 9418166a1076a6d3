package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** C35 (r15): a minimal single-table snapshot log — the versioned
  * manifest layout that turns the C30 "compact into a NEW directory"
  * family into LIVE-TABLE maintenance (the r14 verdict's engine-gap
  * #2). The design is the smallest correct core of the public
  * transaction-log formats (Delta's `_delta_log`, Iceberg's metadata
  * tree): data files are IMMUTABLE and uniquely named; a version file
  * `_graft_log/v<%020d>.json` lists the complete file set of that
  * snapshot; commit = atomically creating the NEXT version file; and
  * readers resolve one version file and read exactly its list — so a
  * reader opened before a compaction commit keeps its entire file set
  * (nothing it references is touched) and a reader opened after sees
  * only the rewritten set. Old-or-new, never mixed, with no
  * coordination between readers and writers.
  *
  * Commit atomicity rides on EXCLUSIVE CREATE (`create(path,
  * overwrite=false)`): POSIX/HDFS give it directly; on object stores
  * it maps to conditional PUT (If-None-Match), which S3/GCS/ABFS all
  * provide. Two racing committers produce one winner and one loud
  * `FileAlreadyExistsException` — optimistic concurrency, retry by
  * re-reading the latest version (the Delta protocol's exact story).
  *
  * Data files live under `data-<uuid>/` subdirectories written by
  * Spark's parquet committer (each commit gets a FRESH subdir, so
  * in-flight writes never collide with live files and an aborted
  * commit leaves only invisible garbage). The log is the ONLY source
  * of truth: a plain `spark.read.parquet(dir)` of the root is
  * meaningless by design — read through [[read]]/[[snapshot]].
  *
  * Scale shape: version files are metadata-sized (one name per data
  * file — the thing C30 compaction exists to keep small); resolution
  * is one `listStatus` of `_graft_log` + one file read; no data-dir
  * listing ever happens on the read path (object-store listings are
  * slow and eventually consistent — the reason every lake format
  * moved file discovery into a log).
  */
object SnapshotLog {

  val LogDirName = "_graft_log"

  /** A resolved snapshot: the version and the ABSOLUTE data-file paths. */
  final case class Snapshot(version: Long, files: Seq[String])

  private def logDir(dir: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(dir, LogDirName)

  private def versionFile(dir: String, v: Long): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(logDir(dir), f"v$v%020d.json")

  private def fs(spark: SparkSession, dir: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val VersionRe = "v(\\d{20})\\.json".r

  /** All committed versions, ascending (empty = not a snapshot table). */
  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val f = fs(spark, dir)
    val ld = logDir(dir)
    if (!f.exists(ld)) Seq.empty
    else Option(f.listStatus(ld)).getOrElse(Array.empty).toSeq
      .flatMap(st => st.getPath.getName match {
        case VersionRe(n) => Some(n.toLong)
        case _ => None
      }).sorted
  }

  /** Resolve a snapshot (latest when `version < 0`). One log listing
    * + one version-file read; the data dir is never listed.
    */
  def snapshot(spark: SparkSession, dir: String, version: Long = -1L): Snapshot = {
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"[graft] SnapshotLog: no committed versions under $dir")
    val v = if (version < 0) vs.last else {
      require(vs.contains(version),
        s"[graft] SnapshotLog: version $version not in committed set $vs")
      version
    }
    val f = fs(spark, dir)
    val in = f.open(versionFile(dir, v))
    val bytes =
      try {
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
        bos.toByteArray
      } finally in.close()
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(bytes)
    require(root.path("format").asText() == "graft-log-v1",
      s"[graft] SnapshotLog: unrecognized version-file format at v$v")
    val it = root.path("files").elements()
    val rel = Seq.newBuilder[String]
    while (it.hasNext) rel += it.next().asText()
    val base = f.makeQualified(new org.apache.hadoop.fs.Path(dir))
    Snapshot(v, rel.result().map(r =>
      new org.apache.hadoop.fs.Path(base, r).toString))
  }

  /** Read a snapshot (latest by default) — exactly its file list. */
  def read(spark: SparkSession, dir: String, version: Long = -1L): DataFrame = {
    val s = snapshot(spark, dir, version)
    require(s.files.nonEmpty,
      s"[graft] SnapshotLog: version ${s.version} has no data files")
    spark.read.parquet(s.files: _*)
  }

  /** Commit `relFiles` as the next version. Exclusive create is the
    * atomicity primitive; a racing committer loses with a loud
    * `FileAlreadyExistsException` (re-read latest and retry —
    * optimistic concurrency).
    */
  private def commit(spark: SparkSession, dir: String,
                     relFiles: Seq[String]): Long = {
    val f = fs(spark, dir)
    f.mkdirs(logDir(dir))
    val next = versions(spark, dir).lastOption.getOrElse(-1L) + 1L
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("format", "graft-log-v1")
    root.put("version", next)
    val arr = root.putArray("files")
    relFiles.foreach { r => arr.add(r); () }
    val json = mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
    val out = f.create(versionFile(dir, next), false) // exclusive create
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    next
  }

  /** Write `df` into a fresh uniquely-named data subdir and return
    * the written parquet files' dir-relative names.
    */
  private def writeDataFiles(df: DataFrame, dir: String): Seq[String] = {
    val sub = s"data-${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val target = new org.apache.hadoop.fs.Path(dir, sub)
    df.write.mode("overwrite").parquet(target.toString)
    val f = fs(df.sparkSession, dir)
    Option(f.listStatus(target)).getOrElse(Array.empty).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(st => s"$sub/${st.getPath.getName}")
      .sorted
  }

  /** REPLACE commit: the next version is exactly `df`'s rows. */
  def write(df: DataFrame, dir: String): Long =
    commit(df.sparkSession, dir, writeDataFiles(df, dir))

  /** APPEND commit: the next version is the previous file set plus
    * `df`'s new files (previous files are never rewritten — append
    * cost is the new data only).
    */
  def append(df: DataFrame, dir: String): Long = {
    val spark = df.sparkSession
    val prevRel = versions(spark, dir).lastOption.map { _ =>
      val s = snapshot(spark, dir)
      val base = fs(spark, dir).makeQualified(
        new org.apache.hadoop.fs.Path(dir)).toString
      s.files.map(abs => abs.stripPrefix(base).stripPrefix("/"))
    }.getOrElse(Seq.empty)
    commit(spark, dir, prevRel ++ writeDataFiles(df, dir))
  }

  /** C30c: LIVE in-place compaction — rewrite the CURRENT snapshot
    * into `ceil(rows / targetRows)` files (range-ordered when
    * `sortCols` given, the [[Sources.compactParquetByRows]] shaping)
    * and commit them as the next version. Readers pinned to the old
    * version keep every file they resolved — the rewrite touches
    * nothing they reference; storage is reclaimed separately by
    * [[vacuum]] once old readers have drained. Returns the new
    * version.
    */
  def compactInPlace(spark: SparkSession, dir: String, targetRows: Long,
                     sortCols: Seq[String] = Nil): Long = {
    require(targetRows >= 1, s"targetRows must be >= 1, got $targetRows")
    import org.apache.spark.sql.functions.col
    val cur = read(spark, dir)
    val n = cur.count()
    val nOut = math.max(1L, (n + targetRows - 1) / targetRows).toInt
    val shaped =
      if (sortCols.nonEmpty)
        cur.repartitionByRange(nOut, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else cur.repartition(nOut)
    commit(spark, dir, writeDataFiles(shaped, dir))
  }

  /** Reclaim storage: drop all but the newest `keepVersions` version
    * files and delete data files no kept version references. Run only
    * after readers of the dropped versions have drained (the standard
    * vacuum contract).
    */
  def vacuum(spark: SparkSession, dir: String, keepVersions: Int = 1): Unit = {
    require(keepVersions >= 1, s"keepVersions must be >= 1, got $keepVersions")
    val vs = versions(spark, dir)
    val (drop, keep) = vs.splitAt(math.max(0, vs.length - keepVersions))
    if (drop.nonEmpty) {
      val f = fs(spark, dir)
      val keptFiles = keep.flatMap(v => snapshot(spark, dir, v).files).toSet
      val dead = drop.flatMap(v => snapshot(spark, dir, v).files)
        .filterNot(keptFiles)
      dead.foreach { p =>
        f.delete(new org.apache.hadoop.fs.Path(p), false); ()
      }
      drop.foreach { v => f.delete(versionFile(dir, v), false); () }
      // drop now-empty data subdirs (cosmetic; ignores non-empty)
      dead.map(p => new org.apache.hadoop.fs.Path(p).getParent).distinct
        .foreach { d =>
          if (Option(f.listStatus(d)).exists(_.isEmpty)) { f.delete(d, false) }
          ()
        }
    }
  }
}
