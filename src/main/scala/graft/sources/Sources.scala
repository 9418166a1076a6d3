package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Input sources (reference: home.py:55-62 reads one CSV/XLSX into
  * pandas). Spark-side the same surface is the distributed readers:
  * CSV/JSONL/Parquet here, XLSX via the JDK-native [[Xlsx]]
  * reader/writer (no external package needed — per-file parallel
  * reads, driver-streamed export).
  */
object Sources {

  /** CSV with header + schema inference (matches the reference's
    * pd.read_csv defaults). At scale prefer an explicit schema:
    * inference scans the file once more.
    */
  def readCsv(spark: SparkSession, path: String,
              header: Boolean = true, inferSchema: Boolean = true,
              delimiter: String = ","): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("inferSchema", inferSchema.toString)
      .option("delimiter", delimiter)
      .csv(path)

  /** JSON-lines (one object per line — the splittable JSON layout). */
  def readJsonLines(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** ORC — the other columnar lake format Spark ships natively
    * (predicate pushdown, column pruning, and splittable stripes,
    * same as parquet; pick whichever the lake standardized on).
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Write `df` as a bucketed parquet table registered in the session
    * catalog (external, at `path`). Two tables bucketed on the same
    * key with the same bucket count join WITHOUT a shuffle: the scan
    * itself satisfies the join's required hash distribution, so the
    * exchange of both sides — the dominant cost of a large join —
    * disappears from the plan. This is the pre-partitioning story for
    * repeatedly-joined 100 TB facts; `sortCols` additionally orders
    * within buckets so sort-merge joins skip their sorts.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    bucketCol: String, buckets: Int,
                    sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .option("path", path)
      .bucketBy(buckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Write `df` hive-partitioned by `partitionCols` (the standard
    * lake layout: one directory level per partition value). Reads
    * that filter on a partition column prune whole directories at
    * plan time (`PartitionFilters` on the scan) — on a date-
    * partitioned 100 TB table, a one-day query lists one directory
    * instead of scanning three years.
    */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Parse an embedded-JSON string column against a DDL schema
    * (native `from_json` — codegen'd, no UDF), e.g.
    * `jsonField(col("props"), "k INT", "k")`.
    */
  def jsonField(c: Column, ddl: String, field: String): Column =
    from_json(c, org.apache.spark.sql.types.StructType.fromDDL(ddl)).getField(field)
}
