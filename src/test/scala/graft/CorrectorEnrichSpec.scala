package graft

import org.apache.spark.sql.functions._
import graft.corrector.{Corrector, Enrich}

class CorrectorEnrichSpec extends SparkSpec {
  import spark.implicits._

  test("case/whitespace/replace chain") {
    val df = Seq("  HELLO   wORLD  ").toDF("s")
    val out = Corrector.replaceSubstring(
      Corrector.strip(Corrector.collapseSpaces(
        Corrector.toTitleCase(df, "s"), "s"), "s"), "s", "World", "W.")
    assert(out.collect()(0).getString(0) == "Hello W.")
  }

  test("normalizePhone strips to last 10 digits") {
    val out = Seq("+90 (532) 123-45-67", "0 532 123 45 67", "123")
      .toDF("p").select(Corrector.normalizePhone(col("p")).as("n")).collect()
    assert(out(0).getString(0) == "5321234567")
    assert(out(1).getString(0) == "5321234567")
    assert(out(2).getString(0) == "123")
  }

  test("replaceValue / nullifyValue / dropRowsWhere") {
    val df = Seq("P", "F", "O").toDF("st")
    val r = Corrector.replaceValue(df, "st", "P", "PENDING")
      .collect().map(_.getString(0)).toSet
    assert(r == Set("PENDING", "F", "O"))
    val n = Corrector.nullifyValue(df, "st", "F").filter(col("st").isNull).count()
    assert(n == 1)
    assert(Corrector.dropRowsWhere(df, col("st") === "O").count() == 2)
  }

  test("fillNullsWithMean fills with rounded column mean") {
    val df = Seq(Some(10.0), Some(20.0), None).toDF("v")
    val filled = Corrector.fillNullsWithMean(df, "v").agg(sum("v")).collect()(0).getDouble(0)
    assert(filled == 45.0)
  }

  test("writeParquet/writeCsv round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val df = Seq((1, "a"), (2, "b")).toDF("id", "s")
    Corrector.writeParquet(df, s"$dir/p")
    Corrector.writeCsv(df, s"$dir/c")
    assert(spark.read.parquet(s"$dir/p").count() == 2)
    assert(spark.read.option("header", "true").csv(s"$dir/c").count() == 2)
  }

  test("dateParts + age derive calendar fields") {
    val df = Seq("2020-02-29").toDF("d").select(col("d").cast("date").as("d"))
    val r = Enrich.age(Enrich.dateParts(df, "d"), "d", "2026-01-01").collect()(0)
    assert(r.getAs[Int]("d_day") == 29)
    assert(r.getAs[String]("d_weekday") == "Saturday")
    assert(r.getAs[Int]("d_month") == 2)
    assert(r.getAs[Int]("d_year") == 2020)
    assert(r.getAs[Int]("d_quarter") == 1)
    assert(r.getAs[Int]("Age_d") == 5)
  }

  test("gender broadcast lookup by first name") {
    val df = Seq("Ayşe Yılmaz", "Ahmet Kaya", "Unknown Person").toDF("name")
    val g = Enrich.gender(df, "name").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(g("Ayşe Yılmaz").contains("K"))
    assert(g("Ahmet Kaya").contains("E"))
    assert(g("Unknown Person").isEmpty)
  }

  test("geo broadcast lookup by city") {
    val df = Seq("Ankara", "Nowhere").toDF("city")
    val g = Enrich.geo(df, "city").collect()
      .map(r => r.getString(0) -> Option(r.getAs[Double]("latitude"))).toMap
    assert(g("Ankara").contains(39.9334))
    assert(g("Nowhere").isEmpty)
  }

  test("genderFromTable joins an arbitrary external dimension (1k rows) via broadcast") {
    // a generated 1k-entry dim stands in for the reference's 12.8k
    // TR_name_gender catalog loaded from an external file
    val dim = spark.range(1000)
      .selectExpr("concat('Name', id) AS nm",
        "CASE WHEN id % 2 = 0 THEN 'E' ELSE 'K' END AS g")
    val facts = Seq("Name42 Soyad", "Name43", "Unknown Person").toDF("full_name")
    val out = Enrich.genderFromTable(facts, "full_name", dim, "nm", "g")
    val got = out.collect().map(r => r.getString(0) -> Option(r.getAs[String]("gender"))).toMap
    assert(got("Name42 Soyad").contains("E")) // first token lookup, even id
    assert(got("Name43").contains("K"))
    assert(got("Unknown Person").isEmpty)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"dim lookup must broadcast:\n$plan")
  }

  test("geoFromTable joins an external lat/lon dimension with custom column names") {
    val dim = Seq(("CityA", 1.5, 2.5), ("CityB", 3.5, 4.5)).toDF("sehir", "lat", "lon")
    val facts = Seq("CityA", "CityC").toDF("city")
    val got = Enrich.geoFromTable(facts, "city", dim, "sehir", "lat", "lon")
      .collect().map(r => r.getString(0) -> Option(r.getAs[Double]("latitude"))).toMap
    assert(got("CityA").contains(1.5) && got("CityC").isEmpty)
  }

  test("README dim-file contract: CSV catalogs load through Sources.readCsv into both enrichers") {
    // exercises the exact shapes documented in README "External
    // dimension catalogs": header CSV, (name,gender) and
    // (city,latitude,longitude), including non-ASCII TR letters
    val dir = java.nio.file.Files.createTempDirectory("graft-dims")
    val genderCsv = dir.resolve("tr_name_gender.csv")
    java.nio.file.Files.writeString(genderCsv,
      "name,gender\nAhmet,E\nFatma,K\nÖzgür,E\n")
    val geoCsv = dir.resolve("tr_province_geo.csv")
    java.nio.file.Files.writeString(geoCsv,
      "city,latitude,longitude\nİstanbul,41.0082,28.9784\nAnkara,39.9334,32.8597\n")
    val genderDim = graft.sources.Sources.readCsv(spark, genderCsv.toString)
    val geoDim = graft.sources.Sources.readCsv(spark, geoCsv.toString)
    val facts = Seq(("Ahmet Yılmaz", "İstanbul"), ("Özgür K", "Ankara"),
      ("Nobody X", "Nowhere")).toDF("full_name", "city")
    val out = Enrich.geoFromTable(
      Enrich.genderFromTable(facts, "full_name", genderDim, "name", "gender"),
      "city", geoDim, "city", "latitude", "longitude")
    val got = out.collect().map(r => r.getString(0) ->
      ((Option(r.getAs[String]("gender")), Option(r.getAs[Double]("latitude"))))).toMap
    assert(got("Ahmet Yılmaz") == ((Some("E"), Some(41.0082))))
    assert(got("Özgür K") == ((Some("E"), Some(39.9334))))
    assert(got("Nobody X") == ((None, None)))
  }

  test("sortBy and reorder") {
    val df = Seq((2, "b"), (1, "a"), (3, "c")).toDF("k", "s")
    val sorted = Corrector.sortBy(df, Seq("k" -> false)).collect().map(_.getInt(0)).toSeq
    assert(sorted == Seq(3, 2, 1))
    assert(Corrector.reorder(df, Seq("s", "k")).columns.toSeq == Seq("s", "k"))
  }

  test("full-size synthetic TR name catalog (12,826 rows) drives genderFromTable through the dim contract") {
    import graft.tools.GenTrNameCatalog
    val rows = GenTrNameCatalog.rows(12826)
    assert(rows.size == 12826)
    assert(rows.map(_._1).distinct.size == 12826, "catalog names must be unique")
    assert(rows == GenTrNameCatalog.rows(12826), "generator must be deterministic")
    assert(rows.count(_._2 == "F") > 4000 && rows.count(_._2 == "M") > 4000,
      "both genders realistically represented")
    // write -> readCsv -> enrich, at the reference catalog's cardinality
    val csv = java.nio.file.Files.createTempDirectory("cat").resolve("tr.csv")
    GenTrNameCatalog.writeCsv(csv.toString)
    val dim = graft.sources.Sources.readCsv(spark, csv.toString)
    assert(dim.count() == 12826)
    import spark.implicits._
    val facts = rows.take(200).map { case (n, _) => n + " Yılmaz" }
      .zipWithIndex.map(_.swap).toDF("id", "full_name")
    val out = Enrich.genderFromTable(facts, "full_name", dim)
    val got = out.select("full_name", "gender").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    rows.take(200).foreach { case (n, g) =>
      assert(got(n + " Yılmaz") == g, s"catalog lookup for $n")
    }
  }
}
