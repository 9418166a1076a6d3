package graft

import java.nio.file.Files
import graft.sources.{MultiCommit, SnapshotLog}
import org.apache.spark.sql.functions._

/** r16: C36 multi-table atomic publish — a reader must never observe
  * the corpus at v(n+1) with its index still at v(n); table-log
  * commits are invisible until the coordinator pins them, one
  * publish pins many tables at once, and unnamed pins carry forward.
  */
class R16MultiSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toString + "/t"

  test("corpus+index move together; in-between table commits are invisible") {
    val coord = tmp("graft_mc")
    val corpusDir = tmp("graft_mc_corpus")
    val indexDir = tmp("graft_mc_index")
    // generation 0: corpus v0 + index v0 (index = a derived census here)
    val corpus0 = (1L to 40L).map(i => (i, s"t$i")).toDF("id", "text")
    SnapshotLog.write(corpus0, corpusDir)
    SnapshotLog.write(corpus0.select(col("id"), length(col("text")).as("sig")),
      indexDir)
    val g0 = MultiCommit.publish(spark, coord, Map(
      "corpus" -> (corpusDir, 0L), "index" -> (indexDir, 0L)))
    assert(g0 == 0L)
    assert(MultiCommit.resolve(spark, coord) ==
      Map("corpus" -> (corpusDir, 0L), "index" -> (indexDir, 0L)))
    // writer advances BOTH table logs... but has not published yet
    val corpus1 = (1L to 60L).map(i => (i, s"t$i")).toDF("id", "text")
    SnapshotLog.write(corpus1, corpusDir)
    SnapshotLog.write(corpus1.select(col("id"), length(col("text")).as("sig")),
      indexDir)
    // a coordinated reader STILL sees the old consistent pair
    assert(MultiCommit.readTable(spark, coord, "corpus").count() == 40)
    assert(MultiCommit.readTable(spark, coord, "index").count() == 40)
    // one publish swaps both pins atomically
    val g1 = MultiCommit.publish(spark, coord, Map(
      "corpus" -> (corpusDir, 1L), "index" -> (indexDir, 1L)))
    assert(g1 == 1L)
    assert(MultiCommit.readTable(spark, coord, "corpus").count() == 60)
    assert(MultiCommit.readTable(spark, coord, "index").count() == 60)
    // every generation is itself a consistent pair (time travel)
    val old = MultiCommit.resolve(spark, coord, 0L)
    assert(old("corpus")._2 == 0L && old("index")._2 == 0L)
    // the count invariant the whole feature exists for: at every
    // generation, corpus rows == index rows
    (0L to 1L).foreach { g =>
      assert(MultiCommit.readTable(spark, coord, "corpus", g).count() ==
        MultiCommit.readTable(spark, coord, "index", g).count())
    }
  }

  test("partial publish carries unnamed pins; bogus versions are refused") {
    val coord = tmp("graft_mc2")
    val aDir = tmp("graft_mc2_a")
    val bDir = tmp("graft_mc2_b")
    SnapshotLog.write(Seq(1L).toDF("id"), aDir)
    SnapshotLog.write(Seq(1L).toDF("id"), bDir)
    MultiCommit.publish(spark, coord, Map(
      "a" -> (aDir, 0L), "b" -> (bDir, 0L)))
    SnapshotLog.write(Seq(1L, 2L).toDF("id"), bDir) // b advances to v1
    val g = MultiCommit.publish(spark, coord, Map("b" -> (bDir, 1L)))
    val pins = MultiCommit.resolve(spark, coord, g)
    assert(pins("a") == (aDir, 0L)) // carried
    assert(pins("b") == (bDir, 1L))
    // refusing a pin that does not exist in the table's log
    val e = intercept[IllegalArgumentException] {
      MultiCommit.publish(spark, coord, Map("a" -> (aDir, 7L)))
    }
    assert(e.getMessage.contains("no committed version 7"))
    // vacuuming a table below a pinned version is the caller's
    // footgun — the pin names versions, so keep pinned versions alive
    assert(MultiCommit.readTable(spark, coord, "a").count() == 1)
  }

  test("publish retention drops old generations; the newest pins keep resolving") {
    val coord = tmp("graft_mc3")
    val aDir = tmp("graft_mc3_a")
    SnapshotLog.write(Seq(1L).toDF("id"), aDir)
    (0 until 6).foreach { i =>
      SnapshotLog.write((0L to i.toLong).toDF("id"), aDir)
      MultiCommit.publish(spark, coord, Map("a" -> (aDir, i.toLong + 1L)))
    }
    assert(MultiCommit.publishes(spark, coord).size == 6)
    MultiCommit.vacuumPublishes(spark, coord, keepGenerations = 2)
    assert(MultiCommit.publishes(spark, coord) == Seq(4L, 5L))
    assert(MultiCommit.readTable(spark, coord, "a").count() == 6)
    assert(MultiCommit.resolve(spark, coord, 4L)("a")._2 == 5L)
    // the next publish continues the generation sequence
    MultiCommit.publish(spark, coord, Map("a" -> (aDir, 6L)))
    assert(MultiCommit.publishes(spark, coord) == Seq(4L, 5L, 6L))
  }
}
