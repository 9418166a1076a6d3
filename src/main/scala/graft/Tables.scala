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
    * once. DataFrames are immutable plans, so sharing is safe; keying
    * on the session keeps a restarted JVM/session from seeing stale
    * plans.
    */
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.getOrElseUpdate((spark, dir, name), spark.read.parquet(s"$dir/$name.parquet"))

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
