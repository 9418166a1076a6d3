package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** C36 (r16): MULTI-TABLE atomic publish — the serving-store
  * consistency story the single-table [[SnapshotLog]] deliberately
  * does not provide. A corpus and its derived index (C33 minhash
  * store, D99b IVF-PQ index) must move TOGETHER: serving corpus
  * v(n+1) against index v(n) silently misses exactly the fresh
  * documents. The coordinator is itself a tiny snapshot log — one
  * `p<%020d>.json` per publish under `<coordDir>/_graft_multi`,
  * committed by the same exclusive-create primitive — whose payload
  * is a PIN SET: `table name -> (table dir, version)`. Readers
  * resolve ONE pin file and open each table AT ITS PINNED VERSION
  * (the log keeps every committed version until vacuum, so pins stay
  * readable); a publish that lands between resolving and reading
  * changes nothing the reader holds. Publishing REPLACES the named
  * tables' pins and carries every other table's pin forward, so a
  * two-table publish is one atomic pointer swap — a reader can
  * never observe the corpus moved without its index.
  *
  * Writers' protocol: commit each table in its own log first (those
  * versions are invisible to coordinated readers), then publish the
  * pins in ONE call. Versions are validated to exist at publish
  * time — a typo'd pin is refused, not served. Lost publish races
  * retry bounded, re-carrying the new latest's unnamed pins.
  */
object MultiCommit {

  val CoordDirName = "_graft_multi"

  private def coordDir(dir: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(dir, CoordDirName)

  private def pinFile(dir: String, v: Long): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(coordDir(dir), f"p$v%020d.json")

  private def fsOf(spark: SparkSession, dir: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val PinRe = "p(\\d{20})\\.json".r

  /** All publish generations, ascending. */
  def publishes(spark: SparkSession, dir: String): Seq[Long] = {
    val f = fsOf(spark, dir)
    val cd = coordDir(dir)
    if (!f.exists(cd)) Seq.empty
    else Option(f.listStatus(cd)).getOrElse(Array.empty).toSeq
      .flatMap(st => st.getPath.getName match {
        case PinRe(n) => Some(n.toLong)
        case _ => None
      }).sorted
  }

  /** The pin set of a publish generation (latest when negative):
    * table name -> (table dir, pinned version).
    */
  def resolve(spark: SparkSession, dir: String,
              generation: Long = -1L): Map[String, (String, Long)] = {
    val gens = publishes(spark, dir)
    require(gens.nonEmpty, s"[graft] MultiCommit: nothing published under $dir")
    val g = if (generation < 0) gens.last else {
      require(gens.contains(generation),
        s"[graft] MultiCommit: generation $generation not published")
      generation
    }
    val f = fsOf(spark, dir)
    val in = f.open(pinFile(dir, g))
    val bytes =
      try {
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
        bos.toByteArray
      } finally in.close()
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(bytes)
    require(root.path("format").asText() == "graft-multi-v1",
      s"[graft] MultiCommit: unrecognized pin-file format at p$g")
    val b = Map.newBuilder[String, (String, Long)]
    val it = root.path("tables").fields()
    while (it.hasNext) {
      val e = it.next()
      b += e.getKey -> (e.getValue.path("dir").asText(),
        e.getValue.path("version").asLong())
    }
    b.result()
  }

  /** Atomically publish `pins` (table -> (tableDir, version)) as the
    * next generation, CARRYING every previously-pinned table not
    * named here. Each pinned version must exist in its table's log.
    * Returns the generation.
    */
  def publish(spark: SparkSession, dir: String,
              pins: Map[String, (String, Long)]): Long = {
    require(pins.nonEmpty, "[graft] MultiCommit.publish: empty pin set")
    pins.foreach { case (name, (tdir, v)) =>
      require(SnapshotLog.versions(spark, tdir).contains(v),
        s"[graft] MultiCommit.publish: table '$name' has no committed " +
          s"version $v under $tdir — commit to the table's log first")
    }
    val f = fsOf(spark, dir)
    f.mkdirs(coordDir(dir))
    val maxAttempts = 10
    var attempt = 0
    while (true) {
      val prev = publishes(spark, dir).lastOption
      val carried = prev.map(g => resolve(spark, dir, g)).getOrElse(Map.empty)
      val all = carried ++ pins
      val next = prev.getOrElse(-1L) + 1L
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = mapper.createObjectNode()
      root.put("format", "graft-multi-v1")
      root.put("generation", next)
      val tn = root.putObject("tables")
      all.toSeq.sortBy(_._1).foreach { case (name, (tdir, v)) =>
        val e = tn.putObject(name)
        e.put("dir", tdir); e.put("version", v); ()
      }
      val json = mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
      try {
        val out = f.create(pinFile(dir, next), false) // exclusive create
        try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        return next
      } catch {
        case t: Throwable if t.isInstanceOf[org.apache.hadoop.fs.FileAlreadyExistsException] ||
            t.isInstanceOf[java.nio.file.FileAlreadyExistsException] ||
            (t.isInstanceOf[java.io.IOException] && Option(t.getMessage)
              .exists(_.toLowerCase.contains("already exists"))) =>
          attempt += 1
          if (attempt >= maxAttempts) throw new java.io.IOException(
            s"[graft] MultiCommit: lost the publish race $maxAttempts times " +
              s"under $dir — giving up", t)
          Thread.sleep(25L * attempt)
      }
    }
    -1L // unreachable
  }

  /** Read one coordinated table at its pinned version. */
  def readTable(spark: SparkSession, dir: String, name: String,
                generation: Long = -1L): DataFrame = {
    val pins = resolve(spark, dir, generation)
    require(pins.contains(name),
      s"[graft] MultiCommit: table '$name' not pinned (have ${pins.keys.mkString(",")})")
    val (tdir, v) = pins(name)
    SnapshotLog.read(spark, tdir, v)
  }

  /** Coordinator-log retention: drop all but the newest
    * `keepGenerations` pin files (one accretes per publish — the
    * same growth C35g bounds for the table logs). Pin files are
    * metadata-only; the pinned TABLE versions are reclaimed by each
    * table's own `SnapshotLog.vacuum`, which the caller must keep
    * AT OR ABOVE the retention here — a kept generation whose table
    * versions were vacuumed underneath it fails loudly at read time,
    * never silently.
    */
  def vacuumPublishes(spark: SparkSession, dir: String,
                      keepGenerations: Int = 1): Unit = {
    require(keepGenerations >= 1,
      s"keepGenerations must be >= 1, got $keepGenerations")
    val gens = publishes(spark, dir)
    val drop = gens.dropRight(keepGenerations)
    val f = fsOf(spark, dir)
    drop.foreach { g => f.delete(pinFile(dir, g), false); () }
  }
}
