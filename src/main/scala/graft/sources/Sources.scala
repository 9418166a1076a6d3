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
  /** C24: conform an incoming batch to a TARGET schema — the
    * schema-drift defense made first-class (the r10→r11 lesson: a
    * physical-type flip in one column silently killed five queries
    * until ingestion became type-adaptive). Per target field:
    * present-and-same-type passes through; present-but-castable casts
    * (when `allowCast`); missing arrives as a typed null. Extra
    * columns drop (when `dropExtras`) — otherwise, and for any
    * un-castable type, this FAILS AT PLAN TIME with the column name,
    * never mid-job on executor 412. Output column order = target
    * order. Name matching is exact (case-sensitive); normalize
    * upstream if a source is case-sloppy.
    */
  def conformSchema(df: DataFrame, target: org.apache.spark.sql.types.StructType,
                    allowCast: Boolean = true,
                    dropExtras: Boolean = true): DataFrame = {
    val present = df.schema.map(f => f.name -> f.dataType).toMap
    val extras = df.columns.filterNot(target.fieldNames.contains)
    if (!dropExtras && extras.nonEmpty)
      throw new IllegalArgumentException(
        s"conformSchema: unexpected columns ${extras.mkString(", ")} " +
          "(dropExtras=false)")
    val cols = target.fields.map { f =>
      present.get(f.name) match {
        case Some(dt) if dt == f.dataType => col(f.name)
        case Some(dt) if allowCast &&
            org.apache.spark.sql.catalyst.expressions.Cast.canCast(dt, f.dataType) =>
          col(f.name).cast(f.dataType).as(f.name)
        case Some(dt) => throw new IllegalArgumentException(
          s"conformSchema: column ${f.name} has type $dt, cannot conform to " +
            s"${f.dataType}" + (if (allowCast) "" else " (allowCast=false)"))
        case None => lit(null).cast(f.dataType).as(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** The audit companion of [[conformSchema]]: one row per affected
    * column — (column, action ∈ pass|cast|add_null|drop, from_type,
    * to_type). Pure schema arithmetic (no data scan); log it with
    * every ingest so drift is visible the batch it happens.
    */
  def conformReport(df: DataFrame, target: org.apache.spark.sql.types.StructType): DataFrame = {
    val present = df.schema.map(f => f.name -> f.dataType).toMap
    val spark = df.sparkSession
    import spark.implicits._
    val rows = target.fields.toSeq.map { f =>
      present.get(f.name) match {
        case Some(dt) if dt == f.dataType =>
          (f.name, "pass", dt.simpleString, f.dataType.simpleString)
        case Some(dt) => (f.name, "cast", dt.simpleString, f.dataType.simpleString)
        case None => (f.name, "add_null", "", f.dataType.simpleString)
      }
    } ++ df.columns.filterNot(target.fieldNames.contains).toSeq.map { c =>
      (c, "drop", present(c).simpleString, "")
    }
    rows.toDF("column", "action", "from_type", "to_type")
  }

  def jsonField(c: Column, ddl: String, field: String): Column =
    from_json(c, org.apache.spark.sql.types.StructType.fromDDL(ddl)).getField(field)
}
