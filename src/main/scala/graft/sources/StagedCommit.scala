package graft.sources

import org.apache.spark.sql.{DataFrame, Row}

/** The executor-side staged-commit protocol shared by the
  * one-file-per-partition sinks (Avro, WARC; the Xlsx/TarShards
  * writers predate the extraction and carry the same shape inline):
  * each non-empty partition writes `part-<pid><ext>` into a
  * `_staging-<uuid>` subdir via a per-attempt temp name + ATOMIC_MOVE
  * (task retries can never interleave bytes), then the driver swaps
  * staging into place — deleting stale parts first — only after every
  * task succeeded, so a failed re-export leaves the previous export
  * intact.
  */
object StagedCommit {

  /** Run `writePart(rows, tmpFile, partName)` for every non-empty
    * partition (`partName` is the committed file name, for formats
    * that embed it) and commit the results into `dir`. `stale`
    * decides which pre-existing files the commit replaces (default:
    * `part-*<ext>`).
    */
  def writePartitioned(df: DataFrame, dir: String, ext: String,
                       stale: String => Boolean = null)
                      (writePart: (Iterator[Row], java.io.File, String) => Unit): Unit = {
    val isStale: String => Boolean =
      if (stale != null) stale
      else n => n.startsWith("part-") && n.endsWith(ext)
    val d = new java.io.File(dir)
    d.mkdirs()
    val staging = new java.io.File(d, s"_staging-${java.util.UUID.randomUUID()}")
    staging.mkdirs()
    val stagingPath = staging.getAbsolutePath
    var committed = false
    try {
      df.foreachPartition { (it: Iterator[Row]) =>
        if (it.hasNext) {
          val tc = org.apache.spark.TaskContext.get()
          val pid = tc.partitionId()
          val tmp = new java.io.File(
            s"$stagingPath/part-$pid$ext.tmp-${tc.taskAttemptId()}")
          val dst = new java.io.File(s"$stagingPath/part-$pid$ext")
          try {
            writePart(it, tmp, s"part-$pid$ext")
            java.nio.file.Files.move(tmp.toPath, dst.toPath,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            ()
          } finally { if (tmp.exists()) { tmp.delete() }; () }
        }
      }
      Option(d.listFiles()).getOrElse(Array.empty).foreach { f =>
        if (f.isFile && isStale(f.getName)) { f.delete(); () }
      }
      Option(staging.listFiles()).getOrElse(Array.empty).foreach { f =>
        java.nio.file.Files.move(f.toPath,
          new java.io.File(d, f.getName).toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        ()
      }
      committed = true
    } finally {
      if (committed) { staging.delete(); () }
      else System.err.println(
        s"[graft] staged export to $dir failed; partial staging left at $stagingPath")
    }
  }
}
