package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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

  /** Epoch-MICROSECONDS long view of a time column, keyed on the
    * column's ACTUAL Spark type instead of an assumed physical parquet
    * layout. The r10 testdata regeneration flipped `events.ts` from
    * int64 TIMESTAMP(NANOS) to timestamp[us] and every call site that
    * hard-coded `ts DIV 1000` broke with DATATYPE_MISMATCH — this is
    * the one place that decision now lives:
    *  - LongType          → epoch-nanos long (the legacy nanosAsLong
    *                        read of TIMESTAMP(NANOS)) `DIV 1000`
    *  - TimestampType     → `unix_micros`
    *  - TimestampNTZType  → `unix_micros` of the TimestampType cast;
    *                        every entrypoint pins the session timezone
    *                        to UTC, so the cast maps the naive value to
    *                        the same instant DuckDB's `epoch_us` uses
    *  - DateType          → midnight-UTC of the date, in µs
    * Unknown types fail loudly at PLAN time (not silently mid-job).
    */
  def epochMicros(df: DataFrame, c: String): Column = df.schema(c).dataType match {
    case LongType | IntegerType => expr(s"`$c` DIV 1000")
    case TimestampType          => unix_micros(col(c))
    case TimestampNTZType       => unix_micros(col(c).cast(TimestampType))
    case DateType               => unix_micros(col(c).cast(TimestampType))
    case other => throw new IllegalArgumentException(
      s"Tables.epochMicros: column `$c` has unsupported type $other " +
        "(expected epoch-nanos LongType or a timestamp/date type)")
  }

  /** TimestampType view of a time column — the input shape
    * `window()`/`session_window()` want — with the same type-adaptive
    * contract as [[epochMicros]]. Long inputs are epoch-NANOS (the
    * legacy nanosAsLong parquet read), truncated to µs integrally
    * (epoch-nanos exceed double's 2^53, so float division could round
    * across a µs — and with it a window — boundary).
    */
  def asTimestamp(df: DataFrame, c: String): Column = df.schema(c).dataType match {
    case LongType | IntegerType => timestamp_micros(expr(s"`$c` DIV 1000"))
    case TimestampType          => col(c)
    case TimestampNTZType       => col(c).cast(TimestampType)
    case DateType               => col(c).cast(TimestampType)
    case other => throw new IllegalArgumentException(
      s"Tables.asTimestamp: column `$c` has unsupported type $other " +
        "(expected epoch-nanos LongType or a timestamp/date type)")
  }

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
