package graft

import java.nio.file.Files
import graft.sources.SnapshotLog
import org.apache.spark.sql.functions._

/** r16: C35i — STRING min/max manifest stats and [[SnapshotLog
  * .readPrunedStr]] data skipping: exact on clustered text keys,
  * truncation-safe on long values (parquet's truncate+increment
  * rule), surrogate-safe (no stats rather than wrong stats), and
  * carried/recomputed through the copy-on-write ops like the numeric
  * stats.
  */
class R16StrStatsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toString + "/t"

  private val langs = Seq("de", "en", "es", "fr", "zh")

  private def langTable(tag: String, sortCols: Seq[String]): String = {
    val dir = tmp(tag)
    val df = (1L to 100L).map(i => (i, langs((i % 5).toInt), s"t$i"))
      .toDF("id", "lang", "text")
    SnapshotLog.write(df.repartition(4), dir)
    SnapshotLog.compactInPlace(spark, dir, 20L, sortCols,
      statsCols = Seq("lang", "id"))
    dir
  }

  test("string skipping prunes lang slices exactly; results match the plain filter") {
    val dir = langTable("graft_str_skip", Seq("lang", "id"))
    val sn = SnapshotLog.snapshot(spark, dir)
    assert(sn.files.size == 5)
    assert(sn.files.forall(f => sn.strStats.get(f).exists(_.contains("lang"))))
    // the de..es slice covers 3 of 5 langs: strictly fewer files open
    val kept = SnapshotLog.prunedFilesStr(sn, "lang", "de", "es")
    assert(kept.size < sn.files.size)
    val pruned = SnapshotLog.readPrunedStr(spark, dir, "lang", "de", "es")
    val want = SnapshotLog.read(spark, dir).filter(col("lang").between("de", "es"))
    assert(pruned.count() == want.count() && pruned.count() == 60)
    assert(pruned.select("id").as[Long].collect().sorted.toSeq ==
      want.select("id").as[Long].collect().sorted.toSeq)
    // a slice past every bound: zero files, schema intact
    val none = SnapshotLog.readPrunedStr(spark, dir, "lang", "zz", "zzz")
    assert(none.count() == 0 && none.columns.toSeq == Seq("id", "lang", "text"))
  }

  test("long values truncate with a safe incremented upper bound — rows never lost") {
    val dir = tmp("graft_str_trunc")
    val pad = "x" * 80 // > StrStatLen, shared prefix beyond the cut
    val df = Seq((1L, pad + "aaa"), (2L, pad + "zzz"), (3L, "short"))
      .toDF("id", "k")
    SnapshotLog.write(df.repartition(1), dir, statsCols = Seq("k"))
    val sn = SnapshotLog.snapshot(spark, dir)
    val (lo, hi) = sn.strStats(sn.files.head)("k")
    assert(lo == "short") // min is the short value, untruncated
    assert(hi.length <= SnapshotLog.StrStatLen)
    assert(hi.compareTo(pad + "zzz") > 0, "upper bound must dominate the true max")
    // range queries on the padded values still find their rows
    val got = SnapshotLog.readPrunedStr(spark, dir, "k", pad + "a", pad + "b")
    assert(got.select("id").as[Long].collect().toSeq == Seq(1L))
    assert(SnapshotLog.readPrunedStr(spark, dir, "k", pad, pad + "~").count() == 2)
  }

  test("supplementary-plane values record no stats (never pruned, never wrong)") {
    val dir = tmp("graft_str_surr")
    val df = Seq((1L, "😀emoji"), (2L, "plain")).toDF("id", "k")
    SnapshotLog.write(df.repartition(1), dir, statsCols = Seq("k", "id"))
    val sn = SnapshotLog.snapshot(spark, dir)
    // min or max carries a surrogate -> the k entry is dropped entirely
    assert(!sn.strStats.get(sn.files.head).exists(_.contains("k")))
    assert(sn.stats(sn.files.head).contains("id")) // numeric stats unaffected
    // and the file is always kept: no silent loss
    assert(SnapshotLog.readPrunedStr(spark, dir, "k", "a", "b").count() == 0)
    assert(SnapshotLog.readPrunedStr(spark, dir, "k", "p", "q").count() == 1)
  }

  test("string stats carry through deleteRange and survive in rewritten files") {
    // id-clustered so the id-delete is file-pruned; every file still
    // carries (wide) lang string stats
    val dir = langTable("graft_str_carry", Seq("id"))
    val before = SnapshotLog.snapshot(spark, dir)
    // delete a numeric id range: only id-overlapping files rewrite
    SnapshotLog.deleteRange(spark, dir, "id", 1L, 10L)
    val after = SnapshotLog.snapshot(spark, dir)
    // every file in the new version still has lang string stats
    assert(after.files.forall(f => after.strStats.get(f).exists(_.contains("lang"))))
    // untouched files carried their exact entries
    val carried = before.files.filter(after.files.contains)
    assert(carried.nonEmpty)
    carried.foreach(f => assert(after.strStats(f) == before.strStats(f)))
    // and string skipping still works post-delete
    val zh = SnapshotLog.readPrunedStr(spark, dir, "lang", "zh", "zh")
    assert(zh.count() == SnapshotLog.read(spark, dir)
      .filter(col("lang") === "zh").count())
  }

  test("string-range DML: deleteRangeStr purges a lang slice file-pruned; updateRangeStr restamps") {
    val dir = langTable("graft_str_dml", Seq("lang", "id"))
    val before = SnapshotLog.snapshot(spark, dir)
    val touched = SnapshotLog.prunedFilesStr(before, "lang", "zh", "zh").toSet
    assert(touched.size < before.files.size)
    SnapshotLog.deleteRangeStr(spark, dir, "lang", "zh", "zh")
    val after = SnapshotLog.snapshot(spark, dir)
    assert(before.files.filterNot(touched).forall(after.files.contains))
    assert(after.files.toSet.intersect(touched).isEmpty)
    val cur = SnapshotLog.read(spark, dir)
    assert(cur.count() == 80 && cur.filter(col("lang") === "zh").count() == 0)
    // update one lang slice's text, other slices' files carried
    val before2 = SnapshotLog.snapshot(spark, dir)
    val touched2 = SnapshotLog.prunedFilesStr(before2, "lang", "de", "de").toSet
    SnapshotLog.updateRangeStr(spark, dir, "lang", "de", "de",
      Map("text" -> concat(col("text"), lit(" [de]"))))
    val after2 = SnapshotLog.snapshot(spark, dir)
    assert(before2.files.filterNot(touched2).forall(after2.files.contains))
    val got = SnapshotLog.read(spark, dir)
    assert(got.filter(col("lang") === "de" && !col("text").endsWith(" [de]")).count() == 0)
    assert(got.filter(col("lang") =!= "de" && col("text").endsWith(" [de]")).count() == 0)
    // no-op string delete commits nothing
    val v = SnapshotLog.deleteRangeStr(spark, dir, "lang", "xx", "xy")
    assert(v == after2.version)
  }

  test("footer-derived numeric stats ≡ the scan they replace (nulls, ints, strings mixed)") {
    // r16: plain INT64/INT32 statsCols come from the parquet footers
    // (metadata-only). The recorded bounds must equal the data's true
    // per-file min/max; an all-null column carries no entry; a string
    // statsCol rides the scan path alongside, unchanged.
    val dir = tmp("graft_footer_stats")
    val df = (1L to 100L).map { i =>
      (i, i.toInt * 3, if (i % 2 == 0) None else Some(i * 7),
        Option.empty[Long], langs((i % 5).toInt))
    }.toDF("id", "k32", "half", "allnull", "lang")
    SnapshotLog.write(df.repartition(4), dir,
      statsCols = Seq("id", "k32", "half", "allnull", "lang"))
    val sn = SnapshotLog.snapshot(spark, dir)
    assert(sn.files.size == 4)
    // reference bounds per file from the data itself
    val ref = spark.read.parquet(
        sn.files.map(f => f): _*)
      .withColumn("_f", input_file_name())
      .groupBy("_f")
      .agg(min("id").as("idlo"), max("id").as("idhi"),
        min("k32").cast("long").as("klo"), max("k32").cast("long").as("khi"),
        min("half").as("hlo"), max("half").as("hhi"),
        min("lang").as("llo"), max("lang").as("lhi"))
      .collect()
    val byName = sn.stats.map { case (k, v) => k.split('/').last -> v }
    val strByName = sn.strStats.map { case (k, v) => k.split('/').last -> v }
    ref.foreach { r =>
      val name = r.getString(0).split('/').last
      val m = byName.getOrElse(name, fail(s"no stats entry for $name"))
      assert(m("id") == ((r.getLong(1), r.getLong(2))))
      assert(m("k32") == ((r.getLong(3), r.getLong(4))))
      assert(m("half") == ((r.getLong(5), r.getLong(6))))
      assert(!m.contains("allnull"), "all-null column must carry no entry")
      val sm = strByName.getOrElse(name, fail(s"no str stats entry for $name"))
      assert(sm("lang") == ((r.getString(7), r.getString(8))))
    }
    // and the skipping behavior built on them still prunes correctly
    val pruned = SnapshotLog.prunedFiles(sn, "id", 1L, 5L)
    assert(pruned.nonEmpty && pruned.size < sn.files.size)
  }
}
