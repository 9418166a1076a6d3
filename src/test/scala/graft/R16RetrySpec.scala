package graft

import java.nio.file.{Files, Paths}
import graft.sources.SnapshotLog
import org.apache.spark.sql.functions._

/** r16: OPTIMISTIC-COMMIT RETRY (C35h) — a lost exclusive-create race
  * rebases against the new latest instead of surfacing a raw
  * FileAlreadyExistsException: appends always rebase (blind-append
  * row of the conflict matrix), the pruned ops (deleteRange /
  * updateRange / mergeInto) rebase when the racer's files don't
  * overlap what they read or prune on, and conflict LOUDLY
  * (ConcurrentModificationException) when they do. Races are made
  * deterministic with the commit-window test hook
  * ([[SnapshotLog.raceTestHook]]), which lands a competing commit
  * between plan and create.
  */
class R16RetrySpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toString + "/t"

  /** Install a hook that fires `body` exactly once (the competing
    * committer's own commits re-enter the hook — the flag stops the
    * recursion), run `op`, always restore the hook.
    */
  private def withRaceOnce[A](body: => Unit)(op: => A): A = {
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    SnapshotLog.raceTestHook = () => if (fired.compareAndSet(false, true)) body
    try op finally SnapshotLog.raceTestHook = () => ()
  }

  private def ids(r: Range) = r.map(i => (i.toLong, s"t$i")).toDF("id", "text")

  test("two appends race: loser rebases, both land, nothing lost") {
    val dir = tmp("graft_race_app")
    SnapshotLog.write(ids(1 to 10), dir, statsCols = Seq("id"))
    val v = withRaceOnce {
      SnapshotLog.append(ids(100 to 104), dir, statsCols = Seq("id"))
    } {
      SnapshotLog.append(ids(200 to 206), dir, statsCols = Seq("id"))
    }
    assert(v == 2L) // hook's append took v1; ours rebased onto it as v2
    assert(SnapshotLog.versions(spark, dir) == Seq(0L, 1L, 2L))
    val got = SnapshotLog.read(spark, dir).select("id").as[Long].collect().sorted
    assert(got.toSeq == ((1L to 10L) ++ (100L to 104L) ++ (200L to 206L)))
    // both appends' stats present in the final manifest
    val sn = SnapshotLog.snapshot(spark, dir)
    assert(sn.files.forall(f => sn.stats.get(f).exists(_.contains("id"))))
  }

  test("replace race: REPLACE depends on nothing — takes the next slot") {
    val dir = tmp("graft_race_wr")
    SnapshotLog.write(ids(1 to 5), dir)
    val v = withRaceOnce {
      SnapshotLog.append(ids(50 to 55), dir)
    } {
      SnapshotLog.write(ids(500 to 503), dir)
    }
    assert(v == 2L)
    assert(SnapshotLog.read(spark, dir).select("id").as[Long].collect().sorted
      .toSeq == (500L to 503L))
  }

  test("deleteRange rebases over a non-overlapping concurrent append") {
    val dir = tmp("graft_race_del_ok")
    SnapshotLog.write(ids(1 to 100).repartition(4), dir)
    SnapshotLog.compactInPlace(spark, dir, 25L, Seq("id"), Seq("id"))
    val appended = ids(200 to 210)
    val v = withRaceOnce {
      SnapshotLog.append(appended, dir, statsCols = Seq("id"))
    } {
      SnapshotLog.deleteRange(spark, dir, "id", 1L, 20L)
    }
    val sn = SnapshotLog.snapshot(spark, dir)
    assert(sn.version == v)
    // rebase carried the racer's file AND applied the delete
    assert(SnapshotLog.read(spark, dir).count() == 80 + 11)
    assert(SnapshotLog.read(spark, dir).filter(col("id") <= 20L).count() == 0)
    assert(SnapshotLog.read(spark, dir).filter(col("id") >= 200L).count() == 11)
  }

  test("deleteRange conflicts when the racer's files overlap the range (or are statless)") {
    val dir = tmp("graft_race_del_no")
    SnapshotLog.write(ids(1 to 100).repartition(4), dir)
    SnapshotLog.compactInPlace(spark, dir, 25L, Seq("id"), Seq("id"))
    intercept[java.util.ConcurrentModificationException] {
      withRaceOnce {
        SnapshotLog.append(ids(5 to 8), dir, statsCols = Seq("id")) // inside [1,20]
      } {
        SnapshotLog.deleteRange(spark, dir, "id", 1L, 20L)
      }
    }
    // statless appended file = could contain anything -> also conflicts
    intercept[java.util.ConcurrentModificationException] {
      withRaceOnce {
        SnapshotLog.append(ids(900 to 905), dir) // no stats
      } {
        SnapshotLog.deleteRange(spark, dir, "id", 30L, 40L)
      }
    }
  }

  test("mergeInto rebases over a non-overlapping append, conflicts on key overlap") {
    val dir = tmp("graft_race_mi")
    val base = (1L to 100L).map(i => (i, s"t$i", 1L)).toDF("id", "text", "version")
    SnapshotLog.write(base.repartition(4), dir)
    SnapshotLog.compactInPlace(spark, dir, 25L, Seq("id"), Seq("id"))
    val batch = Seq((30L, "rev", 2L, "U"), (31L, "rev", 2L, "U"))
      .toDF("id", "text", "version", "op")
    val appendedFar = (300L to 305L).map(i => (i, s"n$i", 1L)).toDF("id", "text", "version")
    val v = withRaceOnce {
      SnapshotLog.append(appendedFar, dir, statsCols = Seq("id"))
    } {
      SnapshotLog.mergeInto(spark, dir, batch, Seq("id"), Seq("version"), Some("op"))
    }
    assert(SnapshotLog.snapshot(spark, dir).version == v)
    val cur = SnapshotLog.read(spark, dir)
    assert(cur.count() == 106)
    assert(cur.filter(col("id") === 30L).select("text").head().getString(0) == "rev")
    assert(cur.filter(col("id") === 300L).count() == 1)
    // overlap case: racer lands a file containing a batch key
    intercept[java.util.ConcurrentModificationException] {
      withRaceOnce {
        SnapshotLog.append(Seq((31L, "racer", 1L)).toDF("id", "text", "version"),
          dir, statsCols = Seq("id"))
      } {
        SnapshotLog.mergeInto(spark, dir,
          Seq((31L, "rev2", 3L, "U")).toDF("id", "text", "version", "op"),
          Seq("id"), Seq("version"), Some("op"))
      }
    }
  }

  test("compactInPlace conflicts on concurrent data change, rebases over metadata-only") {
    val dir = tmp("graft_race_cmp")
    SnapshotLog.write(ids(1 to 60).repartition(3), dir)
    intercept[java.util.ConcurrentModificationException] {
      withRaceOnce {
        SnapshotLog.append(ids(61 to 65), dir)
      } {
        SnapshotLog.compactInPlace(spark, dir, 30L, Seq("id"))
      }
    }
    // metadata-only racer (empty-batch mergeInto): same files, rebase fine
    val v = withRaceOnce {
      SnapshotLog.mergeInto(spark, dir,
        spark.emptyDataset[(Long, String, Long, String)]
          .toDF("id", "text", "version", "op"),
        Seq("id"), Seq("version"), Some("op"), meta = Map("batchId" -> "3"))
    } {
      SnapshotLog.compactInPlace(spark, dir, 30L, Seq("id"), Seq("id"))
    }
    val sn = SnapshotLog.snapshot(spark, dir)
    assert(sn.version == v)
    assert(sn.meta.get("batchId").contains("3")) // racer's meta carried
    assert(SnapshotLog.read(spark, dir).count() == 65)
  }

  test("a contention storm exhausts the bounded retry loudly") {
    val dir = tmp("graft_race_storm")
    SnapshotLog.write(ids(1 to 5), dir)
    val logDir = Paths.get(new java.net.URI(
      SnapshotLog.snapshot(spark, dir).files.head)).getParent.getParent
      .resolve("_graft_log")
    // a hook that ALWAYS steals the next slot with a hand-written
    // (valid, empty) version file — no committer can ever win
    SnapshotLog.raceTestHook = () => {
      val next = Files.list(logDir).iterator()
      var mx = -1L
      while (next.hasNext) {
        val n = next.next().getFileName.toString
        if (n.startsWith("v") && n.endsWith(".json"))
          mx = math.max(mx, n.stripPrefix("v").stripSuffix(".json").toLong)
      }
      Files.write(logDir.resolve(f"v${mx + 1}%020d.json"),
        "{\"format\":\"graft-log-v1\",\"files\":[]}".getBytes)
      ()
    }
    try {
      val e = intercept[java.io.IOException] {
        SnapshotLog.append(ids(10 to 12), dir)
      }
      assert(e.getMessage.contains("lost the commit race"))
    } finally SnapshotLog.raceTestHook = () => ()
  }
}
