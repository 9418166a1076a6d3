package graft

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Avro

class AvroSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("n", IntegerType), StructField("x", DoubleType),
    StructField("f", FloatType), StructField("ok", BooleanType),
    StructField("s", StringType), StructField("b", BinaryType)))

  test("round trip: primitives, nulls, unicode, binary — byte-faithful") {
    val dir = Files.createTempDirectory("graft_avro").toString + "/t"
    val rows = Seq(
      Row(1L, 42, 3.5, 1.25f, true, "héllo\nworld", Array[Byte](1, 2, -3)),
      Row(2L, null, null, null, null, null, null),
      Row(3L, -7, -0.0, Float.MaxValue, false, "", Array.empty[Byte]))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    Avro.writeAvroPartitioned(df, dir)
    val back = Avro.readAvro(spark, dir, schema).collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)),
        Option(r.get(5)),
        Option(r.get(6)).map(_.asInstanceOf[Array[Byte]].toSeq)))
      .sortBy(_._1)
    assert(back.length == 3)
    assert(back(0) == ((1L, Some(42), Some(3.5), Some("héllo\nworld"),
      Some(Seq[Byte](1, 2, -3)))))
    assert(back(1) == ((2L, None, None, None, None)))
    assert(back(2)._4.contains(""))
  }

  test("one file per non-empty partition; overwrite replaces the export") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_avro2").toString + "/t"
    val df = (1L to 100L).toDF("id").repartition(5)
    Avro.writeAvroPartitioned(df, dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(files.length == 5)
    // overwrite with fewer partitions: old parts must not survive
    Avro.writeAvroPartitioned((1L to 10L).toDF("id").repartition(2), dir)
    val files2 = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(files2.length == 2)
    val back = Avro.readAvro(spark, dir,
      StructType(Seq(StructField("id", LongType))))
    assert(back.count() == 10)
  }

  test("complex column refused at plan time; undeclared field reads null") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_avro3").toString + "/t"
    intercept[IllegalArgumentException] {
      Avro.writeAvroPartitioned(
        Seq((1L, Seq(1, 2))).toDF("id", "arr"), dir)
    }
    // Avro-illegal column name refused on the DRIVER at plan time,
    // not via per-task SchemaParseExceptions
    intercept[IllegalArgumentException] {
      Avro.writeAvroPartitioned(
        Seq((1L, "x")).toDF("id", "n-bytes"), dir)
    }
    Avro.writeAvroPartitioned((1L to 4L).toDF("id"), dir)
    val wider = Avro.readAvro(spark, dir, StructType(Seq(
      StructField("id", LongType), StructField("extra", StringType))))
    assert(wider.collect().forall(_.isNullAt(1)))
    assert(wider.count() == 4)
  }
}
