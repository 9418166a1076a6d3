package graft

import java.nio.file.Files
import graft.sources.{SnapshotLog, StagedCommit}
import org.apache.spark.sql.functions._

/** r16: the five r15 ADVICE findings, each pinned by the failure it
  * described —
  *  1. staged re-export over a manifest-committed dir must remove the
  *     stale `_graft_manifest.json` (readers trusted it and served
  *     deleted paths);
  *  2. `readPruned` must read under the manifest-recorded schema so a
  *     pruned read over mixed pre/post-evolution files null-fills the
  *     evolved column exactly like `read`;
  *  3. maintenance commits (compactInPlace / deleteRange /
  *     updateRange) must carry the previous version's meta forward —
  *     the CDC writer's batchId watermark must not reset to -1;
  *  4. a deleteRange that removes every remaining row must leave the
  *     table READABLE (zero rows under the committed schema);
  *  5. is a documentation contract (the connector conditional-create
  *     deployment precondition) — fixed in the SnapshotLog scaladoc;
  *     the commit-collision behavior itself is exercised by the r16
  *     optimistic-retry spec.
  */
class R16FixSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toString + "/t"

  test("staged re-export removes a stale manifest left by a prior manifest commit") {
    val dir = tmp("graft_stale_mf")
    val df = (1L to 6L).toDF("id").repartition(2)
    def writeIds(manifest: Boolean): Unit =
      StagedCommit.writePartitioned(df, dir, ".bin", manifest = manifest) {
        (it, out, _) => it.foreach(r => out.write((r.getLong(0) + "\n").getBytes))
      }
    writeIds(manifest = true) // manifest-committed generation
    assert(new java.io.File(dir).listFiles().exists(_.getName == StagedCommit.ManifestName))
    val committed1 = StagedCommit.committedFiles(spark, dir)
    assert(committed1.exists(_.nonEmpty))
    writeIds(manifest = false) // staged re-export of the same dir
    val names = new java.io.File(dir).listFiles().map(_.getName).toSet
    // the stale manifest is gone, so readers fall back to plain listing
    assert(!names.contains(StagedCommit.ManifestName))
    assert(StagedCommit.committedFiles(spark, dir).isEmpty)
    // and the listed state is exactly the staged generation (2 parts)
    assert(names.count(_.endsWith(".bin")) == 2)
    assert(StagedCommit.binaryFilesCommitted(spark, dir).count() == 2)
  }

  test("readPruned applies the committed schema across a schema-evolving append") {
    val dir = tmp("graft_rp_evo")
    SnapshotLog.write((1L to 40L).map(i => (i, s"t$i")).toDF("id", "text")
      .repartition(2), dir, statsCols = Seq("id"))
    SnapshotLog.append((41L to 60L).map(i => (i, s"t$i", s"L${i % 3}"))
      .toDF("id", "text", "lang").repartition(1), dir, statsCols = Seq("id"))
    // range spanning old and new files: evolved column present, null on old rows
    val mixed = SnapshotLog.readPruned(spark, dir, "id", 30L, 50L)
    assert(mixed.columns.toSeq == Seq("id", "text", "lang"))
    assert(mixed.count() == 21)
    assert(mixed.filter(col("lang").isNull).count() == 11)   // ids 30..40
    assert(mixed.filter(col("lang").isNotNull).count() == 10) // ids 41..50
    // range entirely inside pre-evolution files: still the committed schema
    val oldOnly = SnapshotLog.readPruned(spark, dir, "id", 1L, 5L)
    assert(oldOnly.columns.toSeq == Seq("id", "text", "lang"))
    assert(oldOnly.count() == 5 && oldOnly.filter(col("lang").isNull).count() == 5)
    // every file skipped: empty frame UNDER THE COMMITTED SCHEMA
    val none = SnapshotLog.readPruned(spark, dir, "id", 1000L, 2000L)
    assert(none.columns.toSeq == Seq("id", "text", "lang") && none.count() == 0)
  }

  test("full-table deleteRange leaves a readable empty table under the committed schema") {
    val dir = tmp("graft_del_all")
    SnapshotLog.write((1L to 10L).map(i => (i, s"t$i")).toDF("id", "text")
      .repartition(2), dir, statsCols = Seq("id"))
    val v = SnapshotLog.deleteRange(spark, dir, "id", 0L, 100L)
    assert(v == 1L)
    val empty = SnapshotLog.read(spark, dir)
    assert(empty.columns.toSeq == Seq("id", "text"))
    assert(empty.count() == 0)
    // pruned reads of the empty version are also schema-stable
    val rp = SnapshotLog.readPruned(spark, dir, "id", 1L, 5L)
    assert(rp.columns.toSeq == Seq("id", "text") && rp.count() == 0)
    // and the table recovers on the next write
    SnapshotLog.append(Seq((99L, "z")).toDF("id", "text"), dir)
    assert(SnapshotLog.read(spark, dir).count() == 1)
  }

  test("maintenance commits carry meta forward (CDC batchId watermark survives)") {
    val dir = tmp("graft_meta_carry")
    SnapshotLog.write((1L to 30L).map(i => (i, s"t$i")).toDF("id", "text")
      .repartition(3), dir, statsCols = Seq("id"), meta = Map("batchId" -> "7"))
    SnapshotLog.compactInPlace(spark, dir, 10L, Seq("id"), Seq("id"))
    assert(SnapshotLog.snapshot(spark, dir).meta.get("batchId").contains("7"))
    SnapshotLog.deleteRange(spark, dir, "id", 1L, 5L)
    assert(SnapshotLog.snapshot(spark, dir).meta.get("batchId").contains("7"))
    SnapshotLog.updateRange(spark, dir, "id", 6L, 8L,
      Map("text" -> concat(col("text"), lit("!"))))
    val sn = SnapshotLog.snapshot(spark, dir)
    assert(sn.meta.get("batchId").contains("7"))
    // schema still recorded too (carry did not drop it)
    assert(sn.meta.contains(SnapshotLog.SchemaKey))
    assert(SnapshotLog.read(spark, dir).count() == 25)
  }
}
