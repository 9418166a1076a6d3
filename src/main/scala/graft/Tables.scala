package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry over the driver-generated parquet layout
  * (`TESTDATA.md`): one parquet file per table under an sf dir.
  *
  * At cluster scale these would be partitioned directories; the API
  * takes any path Spark can read, so nothing here is local-only.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Resolved-relation memo, keyed per session: `spark.read.parquet`
    * eagerly lists files and reads footers for schema on every call,
    * which is pure fixed cost when the same table backs many queries —
    * the same reason a production engine resolves through a catalog
    * once. DataFrames are immutable plans, so sharing is safe.
    *
    * The outer map holds sessions WEAKLY (a closed session's entries
    * become collectable — the registry never extends a session's
    * lifetime), and [[refresh]] drops memoized relations whose
    * underlying files were rewritten, re-listing on next load —
    * without it a cached plan would serve the file listing captured at
    * first resolution.
    */
  private val cache = new java.util.WeakHashMap[
    SparkSession, scala.collection.concurrent.TrieMap[(String, String), DataFrame]]()

  private def sessionCache(spark: SparkSession) = cache.synchronized {
    var m = cache.get(spark)
    if (m == null) {
      m = scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]
      cache.put(spark, m)
    }
    m
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    sessionCache(spark).getOrElseUpdate((dir, name),
      spark.read.parquet(s"$dir/$name.parquet"))

  /** Forget memoized relations under `dir` (all dirs if None) for this
    * session and refresh Spark's own file-index caches, so the next
    * [[load]] re-lists files. Call after rewriting or appending to a
    * table's parquet files mid-session.
    */
  def refresh(spark: SparkSession, dir: Option[String] = None): Unit = {
    val m = sessionCache(spark)
    val stale = m.keySet.filter(k => dir.forall(_ == k._1))
    stale.foreach { k =>
      m.remove(k)
      try spark.catalog.refreshByPath(s"${k._1}/${k._2}.parquet")
      catch { case _: Exception => () } // path may be gone; next load re-lists anyway
    }
  }

  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def events(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
