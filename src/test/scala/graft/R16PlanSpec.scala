package graft

import java.nio.file.{Files, Paths}
import graft.sources.SnapshotLog
import org.apache.spark.sql.functions._

/** r16 IO-shape proofs. The pruning claims ("rewrites only touched
  * files", "reads only changed files") are proven the strong way:
  * CORRUPT every file the operator claims not to open — if it opens
  * one anyway, the parquet footer read explodes and the test fails.
  * Plus plan audits for the in-plan guards (one-row broadcast frames,
  * never a shuffle join).
  */
class R16PlanSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toString + "/t"

  private def corrupt(absUri: String): Unit = {
    val p = Paths.get(new java.net.URI(absUri))
    Files.write(p, Array.fill[Byte](64)(0x5a))
    // the .crc sidecar would catch the mismatch before the footer
    // does — remove it so any read fails on parquet, loudly
    val crc = p.getParent.resolve("." + p.getFileName.toString + ".crc")
    Files.deleteIfExists(crc); ()
  }

  test("mergeInto opens ONLY touched files — every untouched file corrupted, merge still lands") {
    val dir = tmp("graft_io_mi")
    SnapshotLog.write((1L to 100L).map(i => (i, s"t$i", 1L))
      .toDF("id", "text", "version").repartition(4), dir)
    SnapshotLog.compactInPlace(spark, dir, 20L, Seq("id"), Seq("id"))
    val before = SnapshotLog.snapshot(spark, dir)
    val batch = Seq((25L, "rev", 2L, "U")).toDF("id", "text", "version", "op")
    val touched = SnapshotLog.batchTouchedFiles(before, batch, "id").toSet
    assert(touched.size == 1)
    before.files.filterNot(touched).foreach(corrupt)
    val v = SnapshotLog.mergeInto(spark, dir, batch, Seq("id"), Seq("version"),
      Some("op"))
    val after = SnapshotLog.snapshot(spark, dir, v)
    // the corrupted files carried path-identically (never opened)
    assert(before.files.filterNot(touched).forall(after.files.contains))
  }

  test("readChanges opens ONLY changed files — the stable base corrupted, CDF still reads") {
    val dir = tmp("graft_io_cdf")
    SnapshotLog.write((1L to 40L).map(i => (i, s"t$i")).toDF("id", "text")
      .repartition(2), dir, statsCols = Seq("id"))
    val v0files = SnapshotLog.snapshot(spark, dir).files
    SnapshotLog.append((41L to 50L).map(i => (i, s"t$i")).toDF("id", "text"),
      dir, statsCols = Seq("id"))
    v0files.foreach(corrupt) // unchanged across v0→v1: must never open
    val cdf = SnapshotLog.readChanges(spark, dir, 0L, 1L)
    assert(cdf.filter(col("_change_type") === "insert")
      .select("id").as[Long].collect().sorted.toSeq == (41L to 50L))
  }

  test("readPruned/readPrunedStr open ONLY kept files — skipped files corrupted") {
    val dir = tmp("graft_io_rp")
    val langs = Seq("de", "en", "es", "fr", "zh")
    SnapshotLog.write((1L to 100L).map(i => (i, langs((i % 5).toInt)))
      .toDF("id", "lang").repartition(4), dir)
    SnapshotLog.compactInPlace(spark, dir, 20L, Seq("lang", "id"),
      statsCols = Seq("lang", "id"))
    val sn = SnapshotLog.snapshot(spark, dir)
    assert(sn.files.size == 5)
    val kept = SnapshotLog.prunedFilesStr(sn, "lang", "de", "en").toSet
    assert(kept.size < sn.files.size)
    sn.files.filterNot(kept).foreach(corrupt)
    assert(SnapshotLog.readPrunedStr(spark, dir, "lang", "de", "en")
      .count() == 40) // de + en classes
  }

  test("compactPartitionInPlace opens ONLY its partition — the others corrupted") {
    val dir = tmp("graft_io_pc")
    val df = (1L to 100L).map(i => (i, s"L${i % 4}")).toDF("id", "lang")
    SnapshotLog.writePartitionedBy(df.repartition(3), dir, "lang")
    val before = SnapshotLog.snapshot(spark, dir)
    before.files.filterNot(f => SnapshotLog.filePartition(f).contains("L1"))
      .foreach(corrupt)
    SnapshotLog.compactPartitionInPlace(spark, dir, "lang", "L1", 50L, Seq("id"))
    val after = SnapshotLog.snapshot(spark, dir)
    assert(after.files.count(f => SnapshotLog.filePartition(f).contains("L1")) == 1)
  }

  test("deleteRange carried-stats path: untouched files stay closed through a second delete") {
    val dir = tmp("graft_io_del2")
    SnapshotLog.write((1L to 100L).map(i => (i, s"t$i")).toDF("id", "text")
      .repartition(4), dir)
    SnapshotLog.compactInPlace(spark, dir, 20L, Seq("id"), Seq("id"))
    SnapshotLog.deleteRange(spark, dir, "id", 1L, 5L) // rewrites file 1
    val sn = SnapshotLog.snapshot(spark, dir)
    // corrupt everything outside [41,60]'s file: the SECOND delete
    // must consult only carried stats + that one file
    val touched2 = SnapshotLog.prunedFiles(sn, "id", 45L, 50L).toSet
    assert(touched2.size == 1)
    sn.files.filterNot(touched2).foreach(corrupt)
    SnapshotLog.deleteRange(spark, dir, "id", 45L, 50L)
    val after = SnapshotLog.snapshot(spark, dir)
    assert(sn.files.filterNot(touched2).forall(after.files.contains))
  }

  test("requireBankFp and mergeIvfPqIndexes guards are one-row broadcast frames, no shuffle join") {
    import graft.ann.{Ann, Pq}
    val emb = (0L until 16L).map { i =>
      (i, (0 until 8).map(d => ((i + d) % 7).toFloat).toArray.toSeq)
    }.toDF("vec_id", "embedding")
    val coarse = Ann.trainCentroidsBySample(emb, "embedding", "vec_id", 2)
    val cb = Pq.codebooksBySample(emb, "embedding", "vec_id", 2, 2, 8)
    val idx = Pq.ivfPqIndexStamped(emb, "embedding", "vec_id", coarse, cb)
    for (guarded <- Seq(Pq.requireBankFp(idx, coarse, cb),
                        Pq.mergeIvfPqIndexes(idx, idx))) {
      val p = guarded.queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode)
      assert(p.contains("BroadcastNestedLoopJoin") ||
        p.contains("BroadcastExchange"), p.take(600))
      assert(!p.contains("SortMergeJoin"), "guard must never shuffle-join")
    }
  }
}
