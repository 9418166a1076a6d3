package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (r16 optimization round): stage timing for
  * q_e2e_pipeline — each stage's frame counted in chain order, so a
  * stage's printed time is its own marginal cost given the pins.
  */
object PipeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.all.foreach(n => graft.Tables.load(spark, dir, n).count())
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    import graft.corrector.Corrector
    import graft.dedup.Dedup
    import graft.text.TextAnalysis
    (1 to 2).foreach { i =>
      val docs = graft.Tables.load(spark, dir, "documents")
      var keepIds: org.apache.spark.sql.DataFrame = null
      time(s"1-qualityFilter run$i") {
        keepIds = TextAnalysis.qualityFilterReport(docs, "text", "doc_id")
          .filter(col("reason") === "keep").select("doc_id")
        keepIds.count(); ()
      }
      val kept = docs.join(keepIds, "doc_id")
      val repaired = Corrector.strip(
        Corrector.collapseSpaces(
          kept.withColumn("text_norm", col("text")), "text_norm"), "text_norm")
      var exact: org.apache.spark.sql.DataFrame = null
      time(s"2-exactDedup run$i") {
        exact = graft.CacheScope.persist(
          Dedup.exactDedup(repaired, "text_norm", "doc_id"))
        exact.count(); ()
      }
      var pairs: org.apache.spark.sql.DataFrame = null
      time(s"3-minhashPairs run$i") {
        pairs = Dedup.minhashPairs(exact, "text_norm", "doc_id", 0.9)
        pairs.count(); ()
      }
      var collapsed: org.apache.spark.sql.DataFrame = null
      time(s"4-components run$i") {
        collapsed = graft.dedup.Components.dedupByPairsBest(exact, "doc_id",
          pairs, "id_a", "id_b", size(split(trim(col("text_norm")), " +")))
        collapsed.count(); ()
      }
      val bench = Corrector.strip(Corrector.collapseSpaces(
        docs.filter(col("doc_id") % 11 === 0).withColumn("text_norm", col("text")),
        "text_norm"), "text_norm")
      val corpus = graft.CacheScope.persist(
        collapsed.filter(col("doc_id") % 11 =!= 0))
      var dirty: org.apache.spark.sql.DataFrame = null
      time(s"5-decontam run$i") {
        dirty = Dedup.contaminatedIds(corpus, "text_norm", "doc_id",
          bench, "text_norm", n = 5)
        dirty.count(); ()
      }
      var clean: org.apache.spark.sql.DataFrame = null
      time(s"6-clean run$i") {
        clean = graft.CacheScope.persist(
          corpus.join(dirty, Seq("doc_id"), "left_anti")
            .withColumn("n_tokens", TextAnalysis.wordCount(col("text_norm"))))
        clean.count(); ()
      }
      time(s"7-mixture+pack run$i") {
        val fracs = graft.pipeline.Pipeline.tokenBudgetFractions(
            clean, col("n_tokens"), col("source"), budgetTokens = 5000,
            temperature = 0.5)
          .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
        val sampled = graft.pipeline.Pipeline.stratifiedSampleByHash(
          clean, col("doc_id"), col("source"), fracs)
        val split_ = graft.pipeline.Pipeline.withSplit(sampled, "doc_id")
        graft.pipeline.Pipeline.packSequences(split_, col("doc_id"),
            col("n_tokens"), contextLen = 256, buckets = 8)
          .select(col("doc_id"), col("source"), col("split"),
            col("n_tokens").cast("long").as("n_tokens"),
            col("pack_id"), col("pack_offset").cast("long").as("pack_offset"))
          .orderBy("doc_id").count(); ()
      }
      time(s"8-e2e_pipeline-whole run$i") {
        graft.SparkEntry.queries("q_e2e_pipeline")(spark, dir).count(); ()
      }
      graft.CacheScope.clear()
    }
    spark.stop()
  }
}
