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

  test("unsupported shapes refused at plan time; undeclared field reads null") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_avro3").toString + "/t"
    // genuinely unsupported (r14 narrowed refusal): non-string map
    // keys and calendar-semantics types
    intercept[IllegalArgumentException] {
      Avro.writeAvroPartitioned(
        Seq((1L, Map(1 -> "a"))).toDF("id", "m"), dir)
    }
    intercept[IllegalArgumentException] {
      Avro.writeAvroPartitioned(
        Seq((1L, java.sql.Date.valueOf("2020-01-01"))).toDF("id", "d"), dir)
    }
    // Avro-illegal column name refused on the DRIVER at plan time,
    // not via per-task SchemaParseExceptions — including NESTED names
    intercept[IllegalArgumentException] {
      Avro.writeAvroPartitioned(
        Seq((1L, "x")).toDF("id", "n-bytes"), dir)
    }
    intercept[IllegalArgumentException] {
      Avro.writeAvroPartitioned(
        Seq((1L, "x")).toDF("id", "s")
          .select(col("id"), struct(col("s").as("bad name")).as("st")), dir)
    }
    Avro.writeAvroPartitioned((1L to 4L).toDF("id"), dir)
    val wider = Avro.readAvro(spark, dir, StructType(Seq(
      StructField("id", LongType), StructField("extra", StringType))))
    assert(wider.collect().forall(_.isNullAt(1)))
    assert(wider.count() == 4)
  }

  test("nested round trip: struct in array, map of struct, nulls at every level") {
    val nested = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("tags", ArrayType(StringType, containsNull = true)),
      StructField("points", ArrayType(StructType(Seq(
        StructField("x", DoubleType, nullable = false),
        StructField("label", StringType))), containsNull = true)),
      StructField("attrs", MapType(StringType, StructType(Seq(
        StructField("n", IntegerType))), valueContainsNull = true))))
    val rows = Seq(
      Row(1L, Seq("a", null, "c"),
        Seq(Row(1.5, "p1"), null, Row(-2.0, null)),
        Map("k1" -> Row(7), "k2" -> null)),
      Row(2L, null, null, null),
      Row(3L, Seq.empty[String], Seq.empty[Row], Map.empty[String, Row]))
    val dir = Files.createTempDirectory("graft_avro4").toString + "/t"
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), nested)
    Avro.writeAvroPartitioned(df, dir)
    val back = Avro.readAvro(spark, dir, nested).collect().sortBy(_.getLong(0))
    assert(back.length == 3)
    assert(back(0).getSeq[String](1) == Seq("a", null, "c"))
    assert(back(0).getSeq[Row](2) == Seq(Row(1.5, "p1"), null, Row(-2.0, null)))
    assert(back(0).getMap[String, Row](3) == Map("k1" -> Row(7), "k2" -> null))
    assert(back(1).isNullAt(1) && back(1).isNullAt(2) && back(1).isNullAt(3))
    assert(back(2).getSeq[String](1).isEmpty &&
      back(2).getMap[String, Row](3).isEmpty)
  }

  test("reader-schema resolution: int-written file promotes to declared long") {
    val dir = Files.createTempDirectory("graft_avro5").toString + "/t"
    val written = StructType(Seq(StructField("v", IntegerType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(7), Row(null)), 1), written)
    Avro.writeAvroPartitioned(df, dir)
    // declared long: Avro's writer→reader resolution promotes int→long
    // per spec instead of smuggling Integer objects into long Rows
    val back = Avro.readAvro(spark, dir,
      StructType(Seq(StructField("v", LongType)))).collect()
    assert(back.map(r => Option(r.get(0))).toSet == Set(Some(7L), None))
  }
}
