package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe (r16 optimization round): phase timing for q_e2e_dq. */
object DqProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.all.foreach(n => graft.Tables.load(spark, dir, n).count())
    val q = graft.SparkEntry.queries
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    import org.apache.spark.sql.functions._
    val li = graft.Tables.load(spark, dir, "lineitem")
    (1 to 3).foreach { i =>
      time(s"pct-quantity run$i") {
        li.agg(percentile(col("l_quantity").cast("double"),
          array(lit(0.25), lit(0.5), lit(0.75)))).collect(); ()
      }
      time(s"pct-extprice run$i") {
        li.agg(percentile(col("l_extendedprice").cast("double"),
          array(lit(0.25), lit(0.5), lit(0.75)))).collect(); ()
      }
      time(s"median_fn-extprice run$i") {
        li.agg(median(col("l_extendedprice").cast("double"))).collect(); ()
      }
      time(s"sort-take-extprice run$i") {
        li.select(col("l_extendedprice").cast("double").as("v"))
          .orderBy("v").limit(1).collect(); ()
      }
      time(s"outlierProfile run$i") {
        graft.profile.Profiler.outlierProfile(li,
          Seq("l_quantity", "l_extendedprice")).collect(); ()
      }
      graft.CacheScope.clear()
    }
    spark.stop()
  }
}
