package graft

import java.nio.file.Files
import graft.sources.{Avro, StagedCommit, TarShards, Warc, Xlsx}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** r15: the manifest-committed (rename-free) sink protocol — unique
  * part names + an atomic manifest publication — and the readers
  * that trust it.
  */
class ManifestCommitSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/t"

  private def listNames(dir: String): Set[String] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .map(_.getName).toSet

  test("avro manifest round-trip on file:, unique part names, manifest present") {
    val dir = tmp("graft_mf_avro")
    val df = (1L to 40L).toDF("id").repartition(4)
    Avro.writeAvroPartitioned(df, dir, manifest = true)
    val names = listNames(dir)
    assert(names.contains(StagedCommit.ManifestName))
    val parts = names.filter(_.endsWith(".avro"))
    assert(parts.size == 4)
    // unique names: commit tag + attempt id embedded, never the bare part-<pid>
    assert(parts.forall(n => n.matches("part-\\d+-c[0-9a-f]{32}-a\\d+\\.avro")), parts)
    val back = Avro.readAvro(spark, dir, StructType(Seq(StructField("id", LongType))))
    assert(back.as[Long].collect().sorted.toSeq == (1L to 40L))
  }

  test("re-export GCs the previous generation only after the new manifest is live") {
    val dir = tmp("graft_mf_gc")
    Avro.writeAvroPartitioned((1L to 10L).toDF("id").repartition(2), dir, manifest = true)
    val gen1 = listNames(dir).filter(_.endsWith(".avro"))
    Avro.writeAvroPartitioned((11L to 16L).toDF("id").repartition(2), dir, manifest = true)
    val gen2 = listNames(dir).filter(_.endsWith(".avro"))
    assert(gen2.size == 2 && gen2.intersect(gen1).isEmpty, s"gen1=$gen1 gen2=$gen2")
    val back = Avro.readAvro(spark, dir, StructType(Seq(StructField("id", LongType))))
    assert(back.as[Long].collect().sorted.toSeq == (11L to 16L))
  }

  test("manifest read path ignores orphan attempts a listing would trip over") {
    val dir = tmp("graft_mf_orphan")
    Avro.writeAvroPartitioned((1L to 12L).toDF("id").repartition(3), dir, manifest = true)
    // a losing speculative attempt: part-shaped name, garbage bytes
    val orphan = new java.io.File(dir, "part-0-cdeadbeefdeadbeefdeadbeefdeadbeef-a99.avro")
    java.nio.file.Files.write(orphan.toPath, Array.fill[Byte](64)(0x5a))
    val committed = StagedCommit.committedFiles(spark, dir).get
    assert(!committed.exists(_.contains("a99")), "manifest must not list the orphan")
    // the manifest read path never opens the orphan → parse succeeds
    val back = Avro.readAvro(spark, dir, StructType(Seq(StructField("id", LongType))))
    assert(back.count() == 12)
    // a plain listing WOULD hand the garbage bytes to the decoder
    val torn = intercept[Exception] {
      spark.read.format("binaryFile").load(dir).select("content").rdd.map { r =>
        val b = r.getAs[Array[Byte]](0)
        new org.apache.avro.file.DataFileReader(
          new org.apache.avro.file.SeekableByteArrayInput(b),
          new org.apache.avro.generic.GenericDatumReader[Any]()).hasNext
      }.count()
    }
    assert(torn != null)
  }

  test("rename-disabled store: auto-routed manifest protocol commits end-to-end") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.nonatomic.impl", classOf[NonAtomicTestFs].getName)
    val local = Files.createTempDirectory("graft_mf_nonatomic").toString + "/t"
    val dir = "nonatomic:" + local
    // no manifest flag: the scheme itself selects the rename-free path;
    // NonAtomicTestFs throws on any rename, so completion proves the
    // protocol never needed the primitive the store lacks
    Avro.writeAvroPartitioned((1L to 30L).toDF("id").repartition(3), dir)
    assert(listNames(local).contains(StagedCommit.ManifestName))
    val back = Avro.readAvro(spark, dir, StructType(Seq(StructField("id", LongType))))
    assert(back.as[Long].collect().sorted.toSeq == (1L to 30L))
    // and a re-export over it (GC + recommit) also never renames
    Avro.writeAvroPartitioned((31L to 35L).toDF("id").repartition(1), dir)
    assert(Avro.readAvro(spark, dir, StructType(Seq(StructField("id", LongType))))
      .as[Long].collect().sorted.toSeq == (31L to 35L))
  }

  test("failed manifest export leaves the previous committed export intact") {
    val dir = tmp("graft_mf_fail")
    val df = (1L to 10L).toDF("id").repartition(2)
    Avro.writeAvroPartitioned(df, dir, manifest = true)
    val before = StagedCommit.committedFiles(spark, dir).get.toSet
    intercept[Exception] {
      StagedCommit.writePartitioned(df, dir, ".avro", manifest = true) { (_, _, _) =>
        sys.error("boom")
      }
    }
    assert(StagedCommit.committedFiles(spark, dir).get.toSet == before)
    assert(Avro.readAvro(spark, dir,
      StructType(Seq(StructField("id", LongType)))).count() == 10)
  }

  test("warc + tar + xlsx round-trip through the manifest read path") {
    val docs = Seq((1L, "alpha doc"), (2L, "beta doc"), (3L, "gamma doc"))
      .toDF("doc_id", "text")
    val wdir = tmp("graft_mf_warc")
    Warc.writeWarcPartitioned(docs.select(
      concat(lit("https://x/"), col("doc_id")).as("target_uri"),
      lit("2026-01-01T00:00:00Z").as("warc_date"),
      lit("text/plain").as("content_type"),
      encode(col("text"), "UTF-8").as("content")).repartition(2),
      wdir, gzip = true, manifest = true)
    assert(listNames(wdir).contains(StagedCommit.ManifestName))
    assert(Warc.readWarc(spark, wdir).filter(col("warc_type") === "resource")
      .count() == 3)

    val tdir = tmp("graft_mf_tar")
    TarShards.writeTarShards(docs.select(
      format_string("%06d", col("doc_id")).as("key"),
      map(lit("txt"), encode(col("text"), "UTF-8")).as("files")).repartition(2),
      tdir, manifest = true)
    assert(listNames(tdir).contains(StagedCommit.ManifestName))
    assert(TarShards.readTarShards(spark, tdir).count() == 3)

    val xdir = tmp("graft_mf_xlsx")
    Xlsx.writeXlsxPartitioned(docs.repartition(2), xdir, manifest = true)
    assert(listNames(xdir).contains(StagedCommit.ManifestName))
    assert(Xlsx.readXlsx(spark, xdir).count() == 3)
  }

  test("all-empty frame commits an empty manifest; readers see zero files") {
    val dir = tmp("graft_mf_empty")
    Avro.writeAvroPartitioned(
      spark.range(10).filter(col("id") < 0).toDF("id").repartition(2),
      dir, manifest = true)
    assert(StagedCommit.committedFiles(spark, dir).get.isEmpty)
    assert(Avro.readAvro(spark, dir,
      StructType(Seq(StructField("id", LongType)))).count() == 0)
  }

  test("staged-protocol dirs (no manifest) still read via listing fallback") {
    val dir = tmp("graft_mf_legacy")
    Avro.writeAvroPartitioned((1L to 8L).toDF("id").repartition(2), dir) // staged
    assert(StagedCommit.committedFiles(spark, dir).isEmpty)
    assert(Avro.readAvro(spark, dir,
      StructType(Seq(StructField("id", LongType)))).count() == 8)
  }
}
