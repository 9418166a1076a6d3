package graft

import java.nio.file.Files
import graft.sources.SnapshotLog
import graft.operators.Merge
import org.apache.spark.sql.functions._

/** r16 wave 1: C35f file-pruned CDC merge ([[SnapshotLog.mergeInto]])
  * — the upsert analogue of deleteRange's manifest-pruned rewrite,
  * and the fix for the r15 verdict's one `weak` (the streaming CDC
  * writer rewrote the whole table every micro-batch).
  */
class R16OpsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toString + "/t"

  /** ids 1..100, version 1, range-compacted into 5 files of 20 rows
    * with doc_id stats — the clustered table every test merges into.
    */
  private def freshTable(tag: String): String = {
    val dir = tmp(tag)
    val base = (1L to 100L).map(i => (i, s"t$i", 1L)).toDF("id", "text", "version")
    SnapshotLog.write(base.repartition(4), dir)
    SnapshotLog.compactInPlace(spark, dir, 20L, Seq("id"), Seq("id"))
    assert(SnapshotLog.snapshot(spark, dir).files.size == 5)
    dir
  }

  private def batchDf(rows: Seq[(Long, String, Long, String)]) =
    rows.toDF("id", "text", "version", "op")

  test("mergeInto rewrites only key-overlapping files; content equals a full merge") {
    val dir = freshTable("graft_mi_core")
    val before = SnapshotLog.snapshot(spark, dir)
    val batch = batchDf(Seq(
      (25L, "t25 rev", 2L, "U"), (30L, "t30 rev", 2L, "U"), // file [21..40]
      (35L, "", 2L, "D"),                                    // same file
      (200L, "new200", 2L, "U"), (201L, "new201", 2L, "U"))) // outside every range
    val expectedTouched = SnapshotLog.batchTouchedFiles(before, batch, "id")
    assert(expectedTouched.size == 1) // exactly the [21..40] file
    val v = SnapshotLog.mergeInto(spark, dir, batch, Seq("id"), Seq("version"),
      Some("op"))
    val after = SnapshotLog.snapshot(spark, dir)
    assert(after.version == v && v == before.version + 1)
    // path identity: the other four files carried untouched
    val untouched = before.files.filterNot(expectedTouched.toSet)
    assert(untouched.forall(after.files.contains))
    assert(after.files.toSet.intersect(expectedTouched.toSet).isEmpty)
    // content equals the full-table merge
    val got = SnapshotLog.read(spark, dir)
      .select("id", "text", "version").as[(Long, String, Long)].collect().sortBy(_._1)
    val want = Merge.mergeLatest(
      SnapshotLog.read(spark, dir, before.version), batch,
      Seq("id"), Seq("version"), Some("op")).drop("op")
      .select("id", "text", "version").as[(Long, String, Long)].collect().sortBy(_._1)
    assert(got.toSeq == want.toSeq)
    assert(got.length == 101) // 100 - 1 delete + 2 inserts
    assert(got.find(_._1 == 25L).get._2 == "t25 rev")
    assert(!got.exists(_._1 == 35L))
    // stats recomputed for the new files: pruning keeps working
    val nextTouched = SnapshotLog.batchTouchedFiles(
      SnapshotLog.snapshot(spark, dir), batchDf(Seq((5L, "x", 3L, "U"))), "id")
    assert(nextTouched.size == 1) // only the [1..20] file
  }

  test("pure-insert batch touches ZERO files — O(batch) cost, everything carried") {
    val dir = freshTable("graft_mi_insert")
    val before = SnapshotLog.snapshot(spark, dir)
    val batch = batchDf((500L to 520L).map(i => (i, s"n$i", 1L, "U")))
    assert(SnapshotLog.batchTouchedFiles(before, batch, "id").isEmpty)
    SnapshotLog.mergeInto(spark, dir, batch, Seq("id"), Seq("version"), Some("op"))
    val after = SnapshotLog.snapshot(spark, dir)
    assert(before.files.forall(after.files.contains))
    assert(SnapshotLog.read(spark, dir).count() == 121)
    // and the new files carry id stats (the previous stat set recomputes)
    val newFiles = after.files.toSet -- before.files.toSet
    assert(newFiles.nonEmpty && newFiles.forall(f => after.stats.get(f).exists(_.contains("id"))))
  }

  test("statless table: every file is touched (correct fallback, = r15 behavior)") {
    val dir = tmp("graft_mi_statless")
    SnapshotLog.write((1L to 50L).map(i => (i, s"t$i", 1L))
      .toDF("id", "text", "version").repartition(3), dir) // no statsCols
    val before = SnapshotLog.snapshot(spark, dir)
    val batch = batchDf(Seq((7L, "t7 rev", 2L, "U")))
    assert(SnapshotLog.batchTouchedFiles(before, batch, "id") == before.files)
    SnapshotLog.mergeInto(spark, dir, batch, Seq("id"), Seq("version"), Some("op"),
      statsCols = Seq("id"))
    val after = SnapshotLog.snapshot(spark, dir)
    assert(after.files.toSet.intersect(before.files.toSet).isEmpty)
    assert(SnapshotLog.read(spark, dir).count() == 50)
    // statsCols bootstrap: the rewrite established stats, next merge prunes
    assert(after.files.forall(f => after.stats.get(f).exists(_.contains("id"))))
  }

  test("schema evolves by adding batch columns; dropping table columns is refused") {
    val dir = freshTable("graft_mi_evo")
    val evoBatch = Seq((25L, "t25 rev", 2L, "U", "en"))
      .toDF("id", "text", "version", "op", "lang")
    SnapshotLog.mergeInto(spark, dir, evoBatch, Seq("id"), Seq("version"), Some("op"))
    val cur = SnapshotLog.read(spark, dir)
    assert(cur.columns.contains("lang"))
    assert(cur.filter(col("id") === 25L).select("lang").head().getString(0) == "en")
    // rows in UNTOUCHED (pre-evolution) files null-fill the new column
    assert(cur.filter(col("id") === 90L).select("lang").head().isNullAt(0))
    assert(cur.filter(col("lang").isNull).count() == 99)
    // a batch that lacks a table column is a refused contraction
    val shrunk = Seq((26L, 2L, "U")).toDF("id", "version", "op")
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.mergeInto(spark, dir, shrunk, Seq("id"), Seq("version"), Some("op"))
    }
    assert(e.getMessage.contains("absent from the batch"))
  }

  test("multi-change-per-key batches dedupe; empty batch commits metadata only") {
    val dir = freshTable("graft_mi_multi")
    val batch = batchDf(Seq(
      (40L, "v2", 2L, "U"), (40L, "v3", 3L, "U"),   // later version wins
      (41L, "v2", 2L, "U"), (41L, "", 3L, "D")))    // delete supersedes
    SnapshotLog.mergeInto(spark, dir, batch, Seq("id"), Seq("version"), Some("op"))
    val got = SnapshotLog.read(spark, dir).filter(col("id").isin(40L, 41L))
      .select("id", "text", "version").as[(Long, String, Long)].collect()
    assert(got.toSeq == Seq((40L, "v3", 3L)))
    // empty batch: version advances with meta, zero files rewritten
    val before = SnapshotLog.snapshot(spark, dir)
    val v = SnapshotLog.mergeInto(spark, dir,
      batchDf(Seq.empty), Seq("id"), Seq("version"), Some("op"),
      meta = Map("batchId" -> "9"))
    val after = SnapshotLog.snapshot(spark, dir)
    assert(v == before.version + 1)
    assert(after.files == before.files)
    assert(after.meta.get("batchId").contains("9"))
  }

  test("CDC writer + maintenance loop: post-compaction batches carry files they don't touch") {
    val dir = tmp("graft_mi_stream")
    val writer = new graft.streaming.StreamingDQ.SnapshotCdcStreamWriter(
      dir, Seq("id"), Seq("version"), "op")
    // batch 0 bootstraps v0 with key stats (single file at this size —
    // AQE rightly coalesces tiny shuffles; clustering arrives with the
    // maintenance compaction, the standard lakehouse loop)
    writer.writeBatch(
      (1L to 60L).map(i => (i, s"t$i", 1L, "U")).toDF("id", "text", "version", "op"), 0L)
    val v0 = SnapshotLog.snapshot(spark, dir)
    assert(v0.files.forall(f => v0.stats.get(f).exists(_.contains("id"))))
    assert(v0.meta.get("batchId").contains("0"))
    // maintenance compaction range-clusters into 3 files of 20
    SnapshotLog.compactInPlace(spark, dir, 20L, Seq("id"), Seq("id"))
    val compacted = SnapshotLog.snapshot(spark, dir)
    assert(compacted.files.size == 3)
    // the batchId watermark survived the maintenance commit, so the
    // next batch is NOT mistaken for a replay...
    writer.writeBatch(
      (5L to 10L).map(i => (i, s"t$i rev", 2L, "U")).toDF("id", "text", "version", "op"), 1L)
    val v2 = SnapshotLog.snapshot(spark, dir)
    assert(v2.meta.get("batchId").contains("1"))
    // ...and it merged FILE-PRUNED: the [21..40] and [41..60] files carried
    val carried = compacted.files.filter(v2.files.contains)
    assert(carried.size == 2,
      s"expected 2 carried files, got ${carried.size} — merge was not file-pruned")
    assert(SnapshotLog.read(spark, dir).filter(col("version") === 2L).count() == 6)
    assert(SnapshotLog.read(spark, dir).count() == 60)
    // a replayed batch (same id) is still a no-op
    val before = SnapshotLog.versions(spark, dir).size
    writer.writeBatch(
      Seq((1L, "bogus", 9L, "U")).toDF("id", "text", "version", "op"), 1L)
    assert(SnapshotLog.versions(spark, dir).size == before)
  }

  test("partitioned live compaction: one partition rewrites, the rest carry path-identically") {
    val dir = tmp("graft_pcomp")
    val df = (1L to 100L).map(i => (i, s"L${i % 4}", s"t$i")).toDF("id", "lang", "text")
    SnapshotLog.writePartitionedBy(df.repartition(4), dir, "lang",
      statsCols = Seq("id"))
    val before = SnapshotLog.snapshot(spark, dir)
    def files(sn: SnapshotLog.Snapshot, v: String) =
      sn.files.filter(f => SnapshotLog.filePartition(f).contains(v))
    assert(files(before, "L0").size == 4) // fragmented: one file per writer task
    val v = SnapshotLog.compactPartitionInPlace(spark, dir, "lang", "L0",
      targetRows = 10L, sortCols = Seq("id"), statsCols = Seq("id"))
    val after = SnapshotLog.snapshot(spark, dir)
    assert(after.version == v && v == before.version + 1)
    assert(files(after, "L0").size == 3) // ceil(25/10)
    // other partitions carried path-identically, stats and all
    val others = before.files.filterNot(files(before, "L0").toSet)
    assert(others.forall(after.files.contains))
    others.foreach(f => assert(after.stats.get(f) == before.stats.get(f)))
    // content unmoved
    assert(SnapshotLog.read(spark, dir).count() == 100)
    assert(SnapshotLog.read(spark, dir).filter(col("lang") === "L0")
      .select("id").as[Long].collect().sorted.toSeq == (4L to 100L by 4L))
    // a value with no files: current version returned, nothing commits
    assert(SnapshotLog.compactPartitionInPlace(spark, dir, "lang", "nope", 10L) == v)
    // an unpartitioned table is refused loudly
    val flat = tmp("graft_pcomp_flat")
    SnapshotLog.write(df, flat)
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.compactPartitionInPlace(spark, flat, "lang", "L0", 10L)
    }
    assert(e.getMessage.contains("not (fully) partition-laid-out"))
  }

  test("partition identity survives hive path escaping") {
    val dir = tmp("graft_pesc")
    val df = Seq((1L, "a b", "x"), (2L, "c:d", "y"), (3L, "plain", "z"))
      .toDF("id", "lang", "text")
    SnapshotLog.writePartitionedBy(df, dir, "lang")
    val sn = SnapshotLog.snapshot(spark, dir)
    val parts = sn.files.flatMap(SnapshotLog.filePartition).toSet
    assert(parts == Set("a b", "c:d", "plain"))
    SnapshotLog.compactPartitionInPlace(spark, dir, "lang", "a b", 10L)
    assert(SnapshotLog.read(spark, dir).count() == 3)
    assert(SnapshotLog.read(spark, dir).filter(col("lang") === "a b").count() == 1)
  }

  test("IVF-PQ retrain: atomic swap via the log; bank guard closes the stale-server window") {
    import graft.ann.Pq
    val dir = tmp("graft_retrain")
    // a tiny synthetic corpus: 24 vectors of dim 8
    val emb = (0L until 24L).map { i =>
      (i, (0 until 8).map(dd => ((i * 7 + dd * 3) % 13).toFloat / 13f).toArray.toSeq)
    }.toDF("vec_id", "embedding")
    // "old" banks from the tail slice so they genuinely differ from
    // the full-corpus retrain (sampling is first-k-by-id)
    val coarseOld = graft.ann.Ann.trainCentroidsBySample(
      emb.filter(col("vec_id") >= 12L), "embedding", "vec_id", 2)
    val cbOld = Pq.codebooksBySample(
      emb.filter(col("vec_id") >= 12L), "embedding", "vec_id", m = 2, k = 2, dim = 8)
    SnapshotLog.write(
      Pq.ivfPqIndexStamped(emb, "embedding", "vec_id", coarseOld, cbOld), dir)
    // retrain on the full corpus and swap as v1
    val (coarseNew, cbNew, v) = Pq.retrainIvfPqIndex(
      emb, "embedding", "vec_id", dir, nlist = 2, m = 2, kCodes = 2, dim = 8)
    assert(v == 1L)
    val atRest = SnapshotLog.read(spark, dir)
    // new banks serve; version meta carries the fingerprint
    assert(Pq.requireBankFp(atRest, coarseNew, cbNew).count() == 24)
    assert(SnapshotLog.snapshot(spark, dir).meta.get("bank_fp")
      .contains(Pq.bankFingerprint(coarseNew, cbNew).toString))
    // a stale server (old banks) raises in-plan instead of serving
    val e = intercept[Exception] {
      Pq.requireBankFp(atRest, coarseOld, cbOld).count()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(t => Option(t.getMessage)
      .exists(_.contains("requireBankFp"))))
    // pinned readers still resolve the OLD index (v0) — old-or-new, never mixed
    val old = SnapshotLog.read(spark, dir, 0L)
    assert(Pq.requireBankFp(old, coarseOld, cbOld).count() == 24)
    // the swapped index equals a fresh build row-for-row
    val fresh = Pq.ivfPqIndexStamped(emb, "embedding", "vec_id", coarseNew, cbNew)
    assert(atRest.exceptAll(fresh).unionAll(fresh.exceptAll(atRest)).count() == 0)
  }
}
