package graft

import java.nio.file.Files
import graft.sources.{Avro, StagedCommit}
import org.apache.spark.sql.types._

class StagedCommitSpec extends SparkSpec {
  import spark.implicits._

  test("object-store schemes route past the staged protocol (r15: no refusal)") {
    // pre-r15 these were refused outright; now they select the rename-free
    // manifest protocol, so the only failure left is the missing connector
    // jar — proof the dispatch reached FileSystem resolution, not a refusal
    val df = Seq((1L, "a")).toDF("id", "s")
    for (uri <- Seq("s3a://bucket/export", "gs://bucket/export")) {
      val e = intercept[Exception] {
        StagedCommit.writePartitioned(df, uri, ".bin") { (_, _, _) => () }
      }
      assert(!e.getMessage.contains("no atomic rename"), uri)
      assert(e.getMessage.toLowerCase.contains("filesystem") ||
        e.getMessage.toLowerCase.contains("scheme"), s"$uri: ${e.getMessage}")
    }
  }

  test("explicit file: URI goes through the same Hadoop path as a bare path") {
    val dir = Files.createTempDirectory("graft_staged").toString + "/t"
    val df = (1L to 20L).toDF("id").repartition(3)
    Avro.writeAvroPartitioned(df, "file:" + dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(files.length == 3)
    assert(new java.io.File(dir).listFiles()
      .forall(!_.getName.startsWith("_staging")))
    val back = Avro.readAvro(spark, dir,
      StructType(Seq(StructField("id", LongType))))
    assert(back.count() == 20)
  }

  test("failed task leaves the previous export intact (staging never commits)") {
    val dir = Files.createTempDirectory("graft_staged2").toString + "/t"
    val df = (1L to 10L).toDF("id").repartition(2)
    Avro.writeAvroPartitioned(df, dir)
    val before = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro")).map(_.getName).toSet
    intercept[Exception] {
      StagedCommit.writePartitioned(df, dir, ".avro") { (_, _, _) =>
        sys.error("boom")
      }
    }
    val after = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro")).map(_.getName).toSet
    assert(after == before)
    assert(Avro.readAvro(spark, dir,
      StructType(Seq(StructField("id", LongType)))).count() == 10)
  }
}
