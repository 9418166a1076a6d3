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
  * Type contract (the conformSchema discipline — explicit, loud):
  * a caller-declared Spark schema maps to Avro as long↔long,
  * int↔int, double↔double, float↔float, boolean↔boolean,
  * string↔string, binary↔bytes — and RECURSIVELY (r13 verdict #5)
  * struct↔record, array↔array, map(string,·)↔map, each nullable
  * level as `union(null, T)` with default null. Still refused,
  * loudly and at plan time: non-string map keys (Avro maps are
  * string-keyed by spec), decimal/date/timestamp (logical types are
  * a calendar-semantics contract this engine keeps in the C26/C27
  * date operators, not the container), and unions beyond
  * nullability. Recursive schemas cannot arise from a `StructType`.
  *
  * Reads REQUIRE the expected schema (no inference scan over
  * 100 TB) and pass it to the datum reader as the READER schema, so
  * Avro's standard writer→reader resolution actually runs (ADVICE
  * r13): files written with promotable types (int where the declared
  * schema says long) resolve per spec instead of smuggling
  * writer-typed objects into Rows; a declared nullable field missing
  * from the writer resolves to its null default; an unresolvable
  * writer type fails loudly at read time.
  */
object Avro {

  private val AvroName = "[A-Za-z_][A-Za-z0-9_]*".r

  private def primType(dt: DataType): Option[String] = dt match {
    case LongType => Some("long")
    case IntegerType => Some("int")
    case DoubleType => Some("double")
    case FloatType => Some("float")
    case BooleanType => Some("boolean")
    case StringType => Some("string")
    case BinaryType => Some("bytes")
    case _ => None
  }

  private def nullable(t: String, isNullable: Boolean): String =
    if (isNullable) s"""["null", $t]""" else t

  /** Avro type JSON for one Spark type (without the nullable union —
    * callers wrap). `path` names nested record types (Avro named
    * types must be unique within a schema). */
  private def typeJson(dt: DataType, path: String): String = dt match {
    case st: StructType => recordJson(st, path)
    case ArrayType(et, containsNull) =>
      s"""{"type": "array", "items": ${nullable(typeJson(et, path + "_item"), containsNull)}}"""
    case MapType(StringType, vt, valueContainsNull) =>
      s"""{"type": "map", "values": ${nullable(typeJson(vt, path + "_value"), valueContainsNull)}}"""
    case MapType(k, _, _) =>
      throw new IllegalArgumentException(
        s"Avro maps are string-keyed by spec; got key type $k — cast keys upstream")
    case other => primType(other) match {
      case Some(t) => "\"" + t + "\""
      case None =>
        throw new IllegalArgumentException(
          s"Avro sink/source supports primitive, struct, array and string-keyed map " +
            s"columns, got $other — cast or serialize it upstream (decimal/date/" +
            "timestamp carry calendar semantics this container contract excludes)")
    }
  }

  private def recordJson(st: StructType, name: String): String = {
    val fields = st.fields.map { f =>
      require(AvroName.pattern.matcher(f.name).matches(),
        s"column '${f.name}' is not a legal Avro field name " +
          "([A-Za-z_][A-Za-z0-9_]*) — rename it upstream")
      val t = typeJson(f.dataType, s"${name}_${f.name}")
      // default only on nullable unions (null must lead the union);
      // a non-null field with a null default is an invalid schema
      if (f.nullable)
        s"""{"name": "${f.name}", "type": ${nullable(t, true)}, "default": null}"""
      else s"""{"name": "${f.name}", "type": $t}"""
    }.mkString(", ")
    s"""{"type": "record", "name": "$name", "fields": [$fields]}"""
  }

  /** Avro record-schema JSON for a Spark schema. Column names are
    * validated against Avro's name grammar HERE — at plan time on
    * the driver — rather than letting `Schema.Parser` throw on every
    * executor task mid-job (the conformSchema loud-failure rule).
    */
  def avroSchemaJson(schema: StructType, recordName: String = "row"): String =
    recordJson(schema, recordName)

  /** The non-null branch of a nullable union (or the schema itself). */
  private def nonNullSchema(s: org.apache.avro.Schema): org.apache.avro.Schema =
    if (s.getType == org.apache.avro.Schema.Type.UNION) {
      val it = s.getTypes.iterator()
      var out: org.apache.avro.Schema = null
      while (it.hasNext && out == null) {
        val t = it.next()
        if (t.getType != org.apache.avro.Schema.Type.NULL) out = t
      }
      out
    } else s

  /** Spark value → Avro value under (Spark type, Avro schema node —
    * possibly the nullable union; primitives ignore it). Maps write
    * key-sorted (TreeMap) so a re-export is byte-identical — the
    * C28/C29 determinism contract (map column VALUES are
    * order-insensitive, the container bytes should not be). */
  private def toAvro(v: Any, dt: DataType, s: org.apache.avro.Schema): AnyRef =
    if (v == null) null
    else dt match {
      case BinaryType => java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case st: StructType =>
        val row = v.asInstanceOf[Row]
        val rs = nonNullSchema(s)
        val rec = new org.apache.avro.generic.GenericData.Record(rs)
        st.fields.zipWithIndex.foreach { case (f, i) =>
          val child = if (row.isNullAt(i)) null else row.get(i)
          rec.put(f.name, toAvro(child, f.dataType, rs.getField(f.name).schema()))
        }
        rec
      case ArrayType(et, _) =>
        val as = nonNullSchema(s)
        val seq = v.asInstanceOf[scala.collection.Seq[Any]]
        val list = new java.util.ArrayList[AnyRef](seq.size)
        seq.foreach(e => list.add(toAvro(e, et, as.getElementType)))
        list
      case MapType(StringType, vt, _) =>
        val ms = nonNullSchema(s)
        val m = v.asInstanceOf[scala.collection.Map[String, Any]]
        val jm = new java.util.TreeMap[String, AnyRef]()
        m.foreach { case (k, mv) => jm.put(k, toAvro(mv, vt, ms.getValueType)) }
        jm
      case _ => v.asInstanceOf[AnyRef]
    }

  /** Avro value → Spark value under the declared Spark type. */
  private def fromAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (u: org.apache.avro.util.Utf8, StringType) => u.toString
    case (s: String, StringType) => s
    case (b: java.nio.ByteBuffer, BinaryType) =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case (r: org.apache.avro.generic.GenericRecord, st: StructType) =>
      Row(st.fields.map { f =>
        val fld = r.getSchema.getField(f.name)
        fromAvro(if (fld == null) null else r.get(f.name), f.dataType)
      }.toIndexedSeq: _*)
    case (l: java.util.Collection[_], ArrayType(et, _)) =>
      val b = IndexedSeq.newBuilder[Any]
      val it = l.iterator()
      while (it.hasNext) b += fromAvro(it.next(), et)
      b.result()
    case (m: java.util.Map[_, _], MapType(StringType, vt, _)) =>
      val b = Map.newBuilder[String, Any]
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        b += (e.getKey.toString -> fromAvro(e.getValue, vt))
      }
      b.result()
    case (x, _) => x
  }

  /** One `part-<i>.avro` per non-empty partition, written by the
    * executors (staging + per-attempt temp + atomic rename — a
    * failed re-export leaves the previous export intact).
    */
  def writeAvroPartitioned(df: DataFrame, dir: String,
                           manifest: Boolean = false): Unit = {
    val sparkSchema = df.schema
    val json = avroSchemaJson(sparkSchema)
    // prove the schema parses ON THE DRIVER (names are pre-validated,
    // but any residual schema defect must fail at plan time, not on
    // every executor task)
    new org.apache.avro.Schema.Parser().parse(json)
    StagedCommit.writePartitioned(df, dir, ".avro",
      manifest = manifest) { (it, out, _) =>
      val avroSchema = new org.apache.avro.Schema.Parser().parse(json)
      val writer = new org.apache.avro.file.DataFileWriter(
        new org.apache.avro.generic.GenericDatumWriter[
          org.apache.avro.generic.GenericRecord](avroSchema))
      writer.create(avroSchema, out)
      try {
        it.foreach { r =>
          writer.append(toAvro(r, sparkSchema, avroSchema)
            .asInstanceOf[org.apache.avro.generic.GenericRecord])
          ()
        }
      } finally writer.close()
    }
  }

  /** Read `.avro` container files under `path` with a REQUIRED
    * expected schema (see type contract above). File-parallel: one
    * task per file. The expected schema rides along as the READER
    * schema, so Avro's writer→reader resolution (type promotion,
    * missing-field defaults, field reordering) runs per spec.
    */
  def readAvro(spark: SparkSession, path: String,
               schema: StructType): DataFrame = {
    val json = avroSchemaJson(schema) // validates names + types, loud
    new org.apache.avro.Schema.Parser().parse(json)
    val names = schema.fields.map(_.name)
    val dts = schema.fields.map(_.dataType)
    val bin = StagedCommit.binaryFilesCommitted(spark, path)
      .filter(col("path").endsWith(".avro"))
      .select("content")
    val rows = bin.rdd.flatMap { r =>
      val bytes = r.getAs[Array[Byte]](0)
      val readerSchema = new org.apache.avro.Schema.Parser().parse(json)
      val reader = new org.apache.avro.file.DataFileReader(
        new org.apache.avro.file.SeekableByteArrayInput(bytes),
        new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord](null, readerSchema))
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
            fromAvro(rec.get(names(i)), dts(i))
          }: _*)
        }
      }
    }
    spark.createDataFrame(rows, schema)
  }
}
