package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Sources

class ShardExportSpec extends SparkSpec {
  import spark.implicits._

  test("jsonl shards: deterministic assignment, one file per shard, faithful round trip") {
    val dir = Files.createTempDirectory("graft_shards").toString + "/out"
    val df = (1L to 520L)
      .map(i => (i, if (i % 97 == 0) null else s"line one of $i\nsecond é line"))
      .toDF("doc_id", "text")
    Sources.exportJsonlShards(df.repartition(9), dir, 100L,
      Seq(col("doc_id")), col("doc_id"))
    val back = spark.read.schema("doc_id LONG, text STRING, global_rank LONG")
      .json(dir)
    // 520 rows -> shards 0..5; shard = (doc_id-1) div 100 since ranks
    // follow doc_id order
    val rows = back.collect()
    assert(rows.length == 520)
    val byShard = back.groupBy("shard").count().collect()
      .map(r => (r.getAs[Number]("shard").longValue(), r.getLong(1))).toMap
    assert(byShard == Map(0L -> 100L, 1L -> 100L, 2L -> 100L, 3L -> 100L,
      4L -> 100L, 5L -> 20L))
    // round trip: text with newlines/unicode and null text both survive
    val m = rows.map(r => r.getLong(0) ->
      (Option(r.getString(1)), r.getLong(2))).toMap
    assert(m(5L) == ((Some("line one of 5\nsecond é line"), 4L)))
    assert(m(97L)._1.isEmpty)
    assert(m(520L)._2 == 519L) // global_rank rides in the record
    // one file per shard
    val files = back.select(col("shard"), input_file_name().as("f"))
      .distinct().groupBy("shard").count().collect().map(_.getLong(1))
    assert(files.forall(_ == 1L))
    // LINE order inside a shard file follows global_rank (the pinned
    // row-for-row contract, not just the multiset)
    val shard0 = new java.io.File(dir, "shard=0").listFiles()
      .filter(_.getName.endsWith(".json")).head
    val ranks = scala.io.Source.fromFile(shard0, "UTF-8").getLines()
      .map(l => "\"global_rank\":(\\d+)".r.findFirstMatchIn(l).get.group(1).toLong)
      .toSeq
    assert(ranks == ranks.sorted && ranks.length == 100)
    // manifest shape
    val man = Sources.shardManifest(back, col("doc_id"), col("text"))
      .orderBy("shard").collect()
    assert(man.map(_.getLong(1)).sum == 520L)
    assert(man.map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((0L, 1L, 100L), (1L, 101L, 200L), (2L, 201L, 300L),
        (3L, 301L, 400L), (4L, 401L, 500L), (5L, 501L, 520L)))
  }

  test("re-export is byte-order identical: same data, different partitioning, same manifest") {
    val base = Files.createTempDirectory("graft_shards2").toString
    val df = (1L to 250L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    Sources.exportJsonlShards(df.repartition(3), s"$base/a", 80L,
      Seq(col("doc_id")), col("doc_id"))
    Sources.exportJsonlShards(df.repartition(11), s"$base/b", 80L,
      Seq(col("doc_id")), col("doc_id"))
    def man(p: String) = Sources.shardManifest(
      spark.read.schema("doc_id LONG, text STRING, global_rank LONG").json(p),
      col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(5))).sortBy(_._1).toSeq
    assert(man(s"$base/a") == man(s"$base/b"))
    intercept[IllegalArgumentException] {
      Sources.exportJsonlShards(df, s"$base/c", 0L, Seq(col("doc_id")),
        col("doc_id"))
    }
  }
}
