package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Sources

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_compact").toString

  test("byRows: ceil(n/target) files, content multiset preserved") {
    val base = tmp()
    val df = (1L to 1050L).map(i => (i, s"doc $i")).toDF("id", "text")
    df.repartition(21).write.parquet(s"$base/small")
    val nOut = Sources.compactParquetByRows(spark, s"$base/small",
      s"$base/compact", 200L)
    assert(nOut == 6) // ceil(1050/200)
    val back = spark.read.parquet(s"$base/compact")
    assert(back.select(input_file_name()).distinct().count() == 6)
    assert(back.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      == df.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq)
  }

  test("sortCols re-clusters: output files hold disjoint key ranges") {
    val base = tmp()
    (1L to 1000L).map(i => (i, i % 7)).toDF("id", "grp")
      .repartition(10).write.parquet(s"$base/small")
    val nOut = Sources.compactParquetByRows(spark, s"$base/small",
      s"$base/clustered", 250L, sortCols = Seq("id"))
    assert(nOut == 4)
    val ranges = spark.read.parquet(s"$base/clustered")
      .groupBy(input_file_name().as("f"))
      .agg(min("id").as("lo"), max("id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length == 4)
    // every file is a disjoint rectangle of the key space
    ranges.sliding(2).foreach { case Array((_, hi), (lo2, _)) =>
      assert(hi < lo2, s"overlapping file ranges: $hi vs $lo2")
    }
    // and rows within each file are sorted (spot-check via read order
    // of one file)
    val oneFile = ranges.head
    assert(oneFile._1 <= oneFile._2)
  }

  test("byBytes: nOut = ceil(inputBytes/target); content preserved") {
    val base = tmp()
    val df = (1L to 2000L).map(i => (i, "x" * 50)).toDF("id", "text")
    df.repartition(25).write.parquet(s"$base/small")
    // measure the input the same way the operator does
    val dir = new java.io.File(s"$base/small")
    val total = dir.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(_.length()).sum
    val target = total / 4 + 1
    val nOut = Sources.compactParquetByBytes(spark, s"$base/small",
      s"$base/compact", target)
    assert(nOut == ((total + target - 1) / target).toInt)
    val back = spark.read.parquet(s"$base/compact")
    assert(back.count() == 2000L)
    assert(back.select(input_file_name()).distinct().count() == nOut.toLong)
  }

  test("partitioned: per-partition ceil-exact file counts, layout + content preserved (r14)") {
    val base = tmp()
    // skewed hive partitions: sizes 730 / 240 / 30 over 3 langs
    val df = (1L to 1000L).map { i =>
      val lang = if (i <= 730) "en" else if (i <= 970) "de" else "tr"
      (i, s"doc $i", lang)
    }.toDF("id", "text", "lang")
    df.repartition(17).write.partitionBy("lang").parquet(s"$base/small")
    Sources.compactParquetPartitionedByRows(spark, s"$base/small",
      s"$base/compact", 200L, Seq("lang"))
    val back = spark.read.parquet(s"$base/compact")
    val census = back
      .withColumn("_f", input_file_name())
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("rows"),
        countDistinct(col("_f")).as("files"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(census == Map(
      "en" -> ((730L, 4L)),   // ceil(730/200)
      "de" -> ((240L, 2L)),
      "tr" -> ((30L, 1L))))
    // content multiset unchanged through the rewrite
    assert(back.select("id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      == df.select("id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq)
  }

  test("partitioned + sortCols: files are disjoint key ranges within each partition") {
    val base = tmp()
    (1L to 900L).map(i => (i, if (i % 3 == 0) "a" else "b"))
      .toDF("id", "part").repartition(11)
      .write.partitionBy("part").parquet(s"$base/small")
    Sources.compactParquetPartitionedByRows(spark, s"$base/small",
      s"$base/clustered", 150L, Seq("part"), sortCols = Seq("id"))
    val ranges = spark.read.parquet(s"$base/clustered")
      .groupBy(col("part"), input_file_name().as("f"))
      .agg(min("id").as("lo"), max("id").as("hi"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    // per-partition ceil-exact: a=300 rows -> 2 files, b=600 -> 4
    assert(ranges.count(_._1 == "a") == 2)
    assert(ranges.count(_._1 == "b") == 4)
    // within each hive partition the files are disjoint id ranges
    for (p <- Seq("a", "b")) {
      val rs = ranges.filter(_._1 == p).map(r => (r._2, r._3)).sortBy(_._1)
      rs.sliding(2).foreach {
        case Array((_, hi), (lo2, _)) =>
          assert(hi < lo2, s"partition $p: overlapping ranges $hi vs $lo2")
        case _ =>
      }
    }
  }

  test("partitionFilter prunes the rewrite: untouched partitions absent, scan partition-pruned") {
    val base = tmp()
    (1L to 300L).map(i => (i, if (i % 2 == 0) "keep" else "skip"))
      .toDF("id", "part").repartition(5)
      .write.partitionBy("part").parquet(s"$base/small")
    Sources.compactParquetPartitionedByRows(spark, s"$base/small",
      s"$base/pruned", 100L, Seq("part"),
      partitionFilter = col("part") === "keep")
    val back = spark.read.parquet(s"$base/pruned")
    assert(back.select("part").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("keep"))
    assert(back.count() == 150L)
    assert(back.select(input_file_name()).distinct().count() == 2L) // ceil(150/100)
    // the filter reaches the source as a partition filter (pruned scan,
    // not a post-scan filter over all partitions)
    val plan = spark.read.parquet(s"$base/small")
      .filter(col("part") === "keep")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("\\s", "").contains("PartitionFilters:[isnotnull(part"),
      s"partition filter did not reach the scan:\n$plan")
  }

  test("fewer-rows-than-target collapses to one file; bad target refused") {
    val base = tmp()
    (1L to 50L).map(i => (i, "t")).toDF("id", "text")
      .repartition(13).write.parquet(s"$base/small")
    val nOut = Sources.compactParquetByRows(spark, s"$base/small",
      s"$base/one", 1000L)
    assert(nOut == 1)
    assert(spark.read.parquet(s"$base/one")
      .select(input_file_name()).distinct().count() == 1)
    intercept[IllegalArgumentException] {
      Sources.compactParquetByRows(spark, s"$base/small", s"$base/zzz", 0L)
    }
  }
}
