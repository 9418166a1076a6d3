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
  * per `.avro` part → streaming decode; Avro files of ~1 GiB are the
  * ecosystem's shipping unit, same argument as WARC); the writer
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

  /** Avro record-schema JSON for a (primitive-typed) Spark schema. */
  def avroSchemaJson(schema: StructType, recordName: String = "row"): String = {
    val fields = schema.fields.map { f =>
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
    val d = new java.io.File(dir)
    d.mkdirs()
    val staging = new java.io.File(d, s"_staging-${java.util.UUID.randomUUID()}")
    staging.mkdirs()
    val stagingPath = staging.getAbsolutePath
    var committed = false
    try {
      df.foreachPartition { (it: Iterator[Row]) =>
        if (it.hasNext) {
          val avroSchema = new org.apache.avro.Schema.Parser().parse(json)
          val tc = org.apache.spark.TaskContext.get()
          val pid = tc.partitionId()
          val tmp = new java.io.File(
            s"$stagingPath/part-$pid.avro.tmp-${tc.taskAttemptId()}")
          val dst = new java.io.File(s"$stagingPath/part-$pid.avro")
          val writer = new org.apache.avro.file.DataFileWriter(
            new org.apache.avro.generic.GenericDatumWriter[
              org.apache.avro.generic.GenericRecord](avroSchema))
          try {
            writer.create(avroSchema, tmp)
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
            writer.close()
            java.nio.file.Files.move(tmp.toPath, dst.toPath,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            ()
          } finally { if (tmp.exists()) { tmp.delete() }; () }
        }
      }
      Option(d.listFiles()).getOrElse(Array.empty).foreach { f =>
        if (f.isFile && f.getName.startsWith("part-") &&
          f.getName.endsWith(".avro")) { f.delete(); () }
      }
      Option(staging.listFiles()).getOrElse(Array.empty).foreach { f =>
        java.nio.file.Files.move(f.toPath,
          new java.io.File(d, f.getName).toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        ()
      }
      committed = true
    } finally {
      if (committed) { staging.delete(); () }
      else System.err.println(
        s"[graft] Avro export failed; partial staging left at $stagingPath")
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
      val out = scala.collection.mutable.ArrayBuffer.empty[Row]
      try {
        while (reader.hasNext) {
          val rec = reader.next()
          out += Row(names.indices.map { i =>
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
      } finally reader.close()
      out
    }
    spark.createDataFrame(rows, schema)
  }
}
