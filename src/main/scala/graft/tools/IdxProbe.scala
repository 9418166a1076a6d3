package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{CacheScope, Tables}
import graft.dedup.Dedup

/** Dev probe (r17): stage-marginal timing of the c33/e2e_maintain
  * index-upsert path — where do ~7 s go at sf0.1?
  * Usage: runMain graft.tools.IdxProbe <sfDir>
  */
object IdxProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.all.foreach(n => Tables.load(spark, dir, n).count())
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.3f"); r
    }
    (1 to 2).foreach { round =>
      println(s"== round $round ==")
      val docs = Tables.load(spark, dir, "documents")
      def idx(df: DataFrame) = Dedup.minhashIndex(df, "text", "doc_id")
      // stage 1: the three index builds, materialized alone
      val i0 = idx(docs.filter(col("doc_id") % 3 === 0))
      val i1 = idx(docs.filter(col("doc_id") % 3 === 1))
      val ib = idx(docs.filter(col("doc_id") % 3 === 2))
      time("idx0_count")(i0.count())
      time("idx1_count")(i1.count())
      time("idxb_count")(ib.count())
      // stage 2: merge (guard + regroup) over the already-cached sides
      val merged = Dedup.mergeNearIndexes(i0, i1)
      time("merge_count")(merged.count())
      // stage 3: the banded match against the merged store
      val hits = Dedup.minhashMatchesIndexed(ib, merged, 0.9)
      time("match_count")(hits.count())
      CacheScope.clear()
      // end-to-end, fresh caches (what the gate pays)
      time("full_gate") {
        val m2 = Dedup.mergeNearIndexes(
          idx(docs.filter(col("doc_id") % 3 === 0)),
          idx(docs.filter(col("doc_id") % 3 === 1)))
        Dedup.minhashMatchesIndexed(idx(docs.filter(col("doc_id") % 3 === 2)),
          m2, 0.9).orderBy("batch_id", "store_id").count()
      }
      CacheScope.clear()
    }
    spark.stop()
  }
}

/** Sub-stage probe of minhashMatchesIndexed at sf0.1. */
object MatchProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.all.foreach(n => Tables.load(spark, dir, n).count())
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.3f"); r
    }
    val docs = Tables.load(spark, dir, "documents")
    def idx(df: DataFrame) = Dedup.minhashIndex(df, "text", "doc_id")
    val i0 = idx(docs.filter(col("doc_id") % 3 === 0))
    val i1 = idx(docs.filter(col("doc_id") % 3 === 1))
    val ib0 = idx(docs.filter(col("doc_id") % 3 === 2))
    val merged0 = Dedup.mergeNearIndexes(i0, i1)
    val batchIndex = CacheScope.persist(ib0)
    val storeIndex = CacheScope.persist(merged0)
    time("warm_batch")(batchIndex.count())
    time("warm_store")(storeIndex.count())
    println("store_rows=" + storeIndex.count() + " batch_rows=" + batchIndex.count())
    val bb = batchIndex.select(explode(col("bks")).as("bk"), col("sid").as("bsid"))
    val sb = storeIndex.select(explode(col("bks")).as("bk"), col("sid").as("ssid"))
    val joined = bb.join(sb, "bk").select("bsid", "ssid")
    time("band_join_rows")(println("  rows=" + joined.count()))
    val cands = CacheScope.persist(joined.distinct())
    time("cand_distinct")(println("  cands=" + cands.count()))
    val attached = cands
      .join(batchIndex.select(col("sid").as("bsid"), col("ws").as("ws_b"),
        col("ids").as("ids_b")), "bsid")
      .join(storeIndex.select(col("sid").as("ssid"), col("ws").as("ws_s"),
        col("ids").as("ids_s")), "ssid")
    val scored = attached.select(col("ids_b"), col("ids_s"),
      round(Dedup.jaccard(col("ws_b"), col("ws_s")), 4).as("jaccard"))
      .filter(col("jaccard") >= 0.9)
    time("attach_score")(println("  hits=" + scored.count()))
    spark.stop()
  }
}

/** d34b-shape sub-stage probe (batch = 2/3, store = 1/3). */
object MatchProbe2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.all.foreach(n => Tables.load(spark, dir, n).count())
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.3f"); r
    }
    val docs = Tables.load(spark, dir, "documents")
    def idx(df: DataFrame) = Dedup.minhashIndex(df, "text", "doc_id")
    val batchIndex = CacheScope.persist(idx(docs.filter(col("doc_id") % 3 =!= 0)))
    val storeIndex = CacheScope.persist(idx(docs.filter(col("doc_id") % 3 === 0)))
    time("warm_batch")(batchIndex.count())
    time("warm_store")(storeIndex.count())
    println("store_rows=" + storeIndex.count() + " batch_rows=" + batchIndex.count())
    val bb = batchIndex.select(explode(col("bks")).as("bk"), col("sid").as("bsid"))
    val sb = storeIndex.select(explode(col("bks")).as("bk"), col("sid").as("ssid"))
    val joined = bb.join(sb, "bk").select("bsid", "ssid")
    time("band_join_rows")(println("  rows=" + joined.count()))
    val cands = CacheScope.persist(joined.distinct())
    time("cand_distinct")(println("  cands=" + cands.count()))
    val attached = cands
      .join(batchIndex.select(col("sid").as("bsid"), col("ws").as("ws_b"),
        col("ids").as("ids_b")), "bsid")
      .join(storeIndex.select(col("sid").as("ssid"), col("ws").as("ws_s"),
        col("ids").as("ids_s")), "ssid")
    val scored = attached.select(col("ids_b"), col("ids_s"),
      round(Dedup.jaccard(col("ws_b"), col("ws_s")), 4).as("jaccard"))
      .filter(col("jaccard") >= 0.9)
    time("attach_score")(println("  hits=" + scored.count()))
    // full gate for reference
    CacheScope.clear()
    time("full_d34b_gate")(
      Dedup.dedupNearAgainstStoreBanded(docs.filter(col("doc_id") % 3 =!= 0),
        docs.filter(col("doc_id") % 3 === 0), "text", "doc_id", 0.9)
        .select("doc_id").orderBy("doc_id").count())
    spark.stop()
  }
}

/** Bench-style 3-runs-then-clear timing (cache reuse across runs). */
object BenchStyle {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.all.foreach(n => Tables.load(spark, dir, n).count())
    names.foreach { n =>
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, dir).count()
        println(f"TIME $n run$i ${(System.nanoTime() - t0) / 1e9}%.3f")
      }
      CacheScope.clear()
    }
    spark.stop()
  }
}

/** Measure size-bound prune rate on the c33 candidate set. */
object SizeBound {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, dir, "documents")
    docs.select(size(Dedup.wordSet(col("text"))).as("sz"))
      .agg(min(col("sz")), expr("percentile(sz, array(0.05,0.25,0.5,0.75,0.95))"), max(col("sz")))
      .show(false)
    def idx(df: DataFrame) = Dedup.minhashIndex(df, "text", "doc_id")
    val batchIndex = CacheScope.persist(idx(docs.filter(col("doc_id") % 3 === 2)))
    val storeIndex = CacheScope.persist(
      Dedup.mergeNearIndexes(idx(docs.filter(col("doc_id") % 3 === 0)),
        idx(docs.filter(col("doc_id") % 3 === 1))))
    val bb = batchIndex.select(explode(col("bks")).as("bk"), col("sid").as("bsid"))
    val sb = storeIndex.select(explode(col("bks")).as("bk"), col("sid").as("ssid"))
    val cands = bb.join(sb, "bk").select("bsid", "ssid").distinct()
    val szB = batchIndex.select(col("sid").as("bsid"), size(col("ws")).as("sz_b"))
    val szS = storeIndex.select(col("sid").as("ssid"), size(col("ws")).as("sz_s"))
    val withSz = cands.join(broadcast(szB), "bsid").join(broadcast(szS), "ssid")
    val kept = withSz.filter(
      least(col("sz_b"), col("sz_s")) * lit(1000000L) >=
        lit(math.floor(0.9 * 1e6).toLong) * greatest(col("sz_b"), col("sz_s")))
    println("cands=" + withSz.count() + " kept_after_size_bound=" + kept.count())
    spark.stop()
  }
}
