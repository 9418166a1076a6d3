package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** C32: native Avro source/sink — the row-oriented interchange format
  * of the Kafka/streaming-ingest ecosystem (schema'd, splittable by
  * sync markers, append-friendly), the row-ish sibling of the
  * columnar parquet path. Spark ships the Avro LIBRARY in its jars
  * but not the `format("avro")` connector module, so this is the
  * C20/C28/C29 move again: the format implemented directly on the
  * public Avro Java API (`DataFileReader`/`DataFileWriter` +
  * `GenericRecord`), no external package.
  *
  * Scale shape: the reader is file-parallel (`binaryFile` → one task
  * per `.avro` part → record-LAZY decode, so decoded rows never pile
  * up beside the container bytes; `binaryFile` does materialize the
  * raw bytes and caps parts at 2 GB — size parts accordingly, which
  * is the ecosystem's ~1 GiB shipping convention anyway); the writer
  * emits one container file PER PARTITION executor-side through the
  * staging + atomic-rename commit protocol (the Warc/Xlsx pattern),
  * so no driver funnel in either direction.
  *
  * Type contract (the conformSchema discipline — explicit, loud): a
  * caller-declared Spark schema maps to Avro as long↔long, int↔int,
  * double↔double, float↔float, boolean↔boolean, string↔string,
  * binary↔bytes, each nullable as `union(null, T)`; any other Spark
  * type throws at plan time. Reads REQUIRE the expected schema (no
  * inference scan over 100 TB); a file whose records don't carry a
  * declared field reads it as null, and Avro's own resolution rules
  * apply otherwise.
  */
object Avro {

  private def avroType(dt: DataType): String = dt match {
    case LongType => "long"
    case IntegerType => "int"
    case DoubleType => "double"
    case FloatType => "float"
    case BooleanType => "boolean"
    case StringType => "string"
    case BinaryType => "bytes"
    case other =>
      throw new IllegalArgumentException(
        s"Avro sink/source supports primitive columns only, got $other — " +
          "cast or serialize complex columns upstream")
  }

  private val AvroName = "[A-Za-z_][A-Za-z0-9_]*".r

  /** Avro record-schema JSON for a (primitive-typed) Spark schema.
    * Column names are validated against Avro's name grammar HERE —
    * at plan time on the driver — rather than letting
    * `Schema.Parser` throw on every executor task mid-job (the
    * conformSchema loud-failure rule).
    */
  def avroSchemaJson(schema: StructType, recordName: String = "row"): String = {
    val fields = schema.fields.map { f =>
      require(AvroName.pattern.matcher(f.name).matches(),
        s"column '${f.name}' is not a legal Avro field name " +
          "([A-Za-z_][A-Za-z0-9_]*) — rename it upstream")
      val t = "\"" + avroType(f.dataType) + "\""
      // default only on nullable unions (null must lead the union);
      // a non-null field with a null default is an invalid schema
      if (f.nullable)
        s"""{"name": "${f.name}", "type": ["null", $t], "default": null}"""
      else s"""{"name": "${f.name}", "type": $t}"""
    }.mkString(", ")
    s"""{"type": "record", "name": "$recordName", "fields": [$fields]}"""
  }

  /** One `part-<i>.avro` per non-empty partition, written by the
    * executors (staging + per-attempt temp + atomic rename — a
    * failed re-export leaves the previous export intact).
    */
  def writeAvroPartitioned(df: DataFrame, dir: String): Unit = {
    val sparkSchema = df.schema
    val json = avroSchemaJson(sparkSchema)
    // prove the schema parses ON THE DRIVER (names are pre-validated,
    // but any residual schema defect must fail at plan time, not on
    // every executor task)
    new org.apache.avro.Schema.Parser().parse(json)
    StagedCommit.writePartitioned(df, dir, ".avro") { (it, tmp, _) =>
      val avroSchema = new org.apache.avro.Schema.Parser().parse(json)
      val writer = new org.apache.avro.file.DataFileWriter(
        new org.apache.avro.generic.GenericDatumWriter[
          org.apache.avro.generic.GenericRecord](avroSchema))
      writer.create(avroSchema, tmp)
      try {
        it.foreach { r =>
          val rec = new org.apache.avro.generic.GenericData.Record(avroSchema)
          sparkSchema.fields.zipWithIndex.foreach { case (f, i) =>
            val v: AnyRef =
              if (r.isNullAt(i)) null
              else f.dataType match {
                case BinaryType =>
                  java.nio.ByteBuffer.wrap(r.getAs[Array[Byte]](i))
                case _ => r.get(i).asInstanceOf[AnyRef]
              }
            rec.put(f.name, v)
          }
          writer.append(rec)
          ()
        }
      } finally writer.close()
    }
  }

  /** Read `.avro` container files under `path` with a REQUIRED
    * expected schema (primitive columns; see type contract above).
    * File-parallel: one task per file.
    */
  def readAvro(spark: SparkSession, path: String,
               schema: StructType): DataFrame = {
    schema.fields.foreach(f => avroType(f.dataType)) // validate loud
    val names = schema.fields.map(_.name)
    val dts = schema.fields.map(_.dataType)
    val bin = spark.read.format("binaryFile").load(path)
      .filter(col("path").endsWith(".avro"))
      .select("content")
    val rows = bin.rdd.flatMap { r =>
      val bytes = r.getAs[Array[Byte]](0)
      val reader = new org.apache.avro.file.DataFileReader(
        new org.apache.avro.file.SeekableByteArrayInput(bytes),
        new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord]())
      // LAZY iterator: decode record-by-record so the task never
      // holds the decoded rows alongside the container bytes (a
      // ~1 GiB part decoded eagerly would multiply its own footprint;
      // binaryFile still materializes the raw bytes and caps files at
      // 2 GB — the documented container-size contract)
      new Iterator[Row] {
        def hasNext: Boolean = {
          val h = reader.hasNext
          if (!h) reader.close()
          h
        }
        def next(): Row = {
          val rec = reader.next()
          Row(names.indices.map { i =>
            val f = rec.getSchema.getField(names(i))
            val v = if (f == null) null else rec.get(names(i))
            (v, dts(i)) match {
              case (null, _) => null
              case (u: org.apache.avro.util.Utf8, StringType) => u.toString
              case (s: String, StringType) => s
              case (b: java.nio.ByteBuffer, BinaryType) =>
                val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
              case (x, _) => x
            }
          }: _*)
        }
      }
    }
    spark.createDataFrame(rows, schema)
  }
}
