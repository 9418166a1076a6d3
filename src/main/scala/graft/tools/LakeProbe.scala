package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (r16 optimization round): phase timing for the
  * snapshot-log gates — commit phases vs read/cert phases.
  */
object LakeProbe {
  def main(args: Array[String]): Unit = {
    val dir0 = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.all.foreach(n => graft.Tables.load(spark, dir0, n).count())
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    val L = graft.sources.SnapshotLog
    (1 to 2).foreach { i =>
      val dir = "/tmp/graft_gate/lakeprobe"
      val root = new org.apache.hadoop.fs.Path(dir)
      val hfs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      hfs.delete(root, true)
      val docs = graft.Tables.load(spark, dir0, "documents")
        .select(col("doc_id"), col("text"), col("lang"))
      time(s"1-write-v0 run$i") {
        L.write(docs.filter(col("doc_id") % 2 === 0).repartition(4), dir,
          statsCols = Seq("doc_id")); ()
      }
      time(s"2-append-v1 run$i") {
        L.append(docs.filter(col("doc_id") % 2 === 1).repartition(2), dir,
          statsCols = Seq("doc_id")); ()
      }
      time(s"3-deleteRange run$i") {
        L.deleteRange(spark, dir, "doc_id", 10L, 40L); ()
      }
      time(s"4-updateRange run$i") {
        L.updateRange(spark, dir, "doc_id", 50L, 80L,
          Map("lang" -> lit("xx"))); ()
      }
      time(s"5-read-v0-agg run$i") {
        L.read(spark, dir, 0L).groupBy("lang").agg(count(lit(1))).count(); ()
      }
      time(s"6-readChanges-agg run$i") {
        L.readChanges(spark, dir, 0L, 3L).groupBy("lang")
          .agg(sum(when(col("_change_type") === "insert", 1L)
            .otherwise(-1L))).count(); ()
      }
      time(s"7-read-final-agg run$i") {
        L.read(spark, dir).groupBy("lang").agg(count(lit(1))).count(); ()
      }
      time(s"8-whole-gate run$i") {
        graft.SparkEntry.queries("q_e2e_incremental")(spark, dir0).count(); ()
      }
      val dir2 = "/tmp/graft_gate/lakeprobe_nostats"
      hfs.delete(new org.apache.hadoop.fs.Path(dir2), true)
      time(s"9-write-v0-NOSTATS run$i") {
        L.write(docs.filter(col("doc_id") % 2 === 0).repartition(4), dir2); ()
      }
      time(s"10-append-NOSTATS run$i") {
        L.append(docs.filter(col("doc_id") % 2 === 1).repartition(2), dir2); ()
      }
      graft.CacheScope.clear()
    }
    spark.stop()
  }
}
