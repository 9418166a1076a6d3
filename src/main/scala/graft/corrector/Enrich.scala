package graft.corrector

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset enrichment (reference: home.py:1710-1963 "Enrich your
  * Dataset"): date-part derivation, age, and small-dimension lookups
  * (name→gender, city→lat/lon). Lookups are broadcast hash joins —
  * the dimension ships to every executor once; the fact table never
  * shuffles.
  */
object Enrich {

  /** home.py enrich: Day / Weekday / Month / Year / Quarter /
    * WeekofYear in one pass.
    */
  def dateParts(df: DataFrame, column: String): DataFrame = {
    val d = col(column).cast("date")
    df.withColumn(s"${column}_day", dayofmonth(d))
      .withColumn(s"${column}_weekday", date_format(d, "EEEE"))
      .withColumn(s"${column}_month", month(d))
      .withColumn(s"${column}_year", year(d))
      .withColumn(s"${column}_quarter", quarter(d))
      .withColumn(s"${column}_weekofyear", weekofyear(d))
  }

  /** home.py Age/Anniversary enrich: whole years between the value
    * and `asOf` (deterministic — caller passes the reference date
    * instead of now()).
    */
  def yearsSince(c: Column, asOf: String): Column =
    floor(datediff(to_date(lit(asOf)), c.cast("date")) / 365.25).cast("int")
  def age(df: DataFrame, column: String, asOf: String): DataFrame =
    df.withColumn(s"Age_$column", yearsSince(col(column), asOf))

  /** Compact name→gender seed (reference ships 12.8k Turkish entries
    * in TR_name_gender.py; the engine treats it as a pluggable
    * broadcast dimension — callers can supply a full table of any
    * size, and it stays a broadcast join while the dim is small).
    */
  val defaultGenderSeed: Seq[(String, String)] = Seq(
    "Ahmet" -> "E", "Mehmet" -> "E", "Mustafa" -> "E", "Ali" -> "E",
    "Hasan" -> "E", "Hüseyin" -> "E", "İbrahim" -> "E", "Osman" -> "E",
    "Murat" -> "E", "Ömer" -> "E", "Yusuf" -> "E", "Emre" -> "E",
    "Burak" -> "E", "Kemal" -> "E", "Serkan" -> "E", "Deniz" -> "E",
    "Fatma" -> "K", "Ayşe" -> "K", "Emine" -> "K", "Hatice" -> "K",
    "Zeynep" -> "K", "Elif" -> "K", "Meryem" -> "K", "Özlem" -> "K",
    "Merve" -> "K", "Esra" -> "K", "Selin" -> "K", "Gül" -> "K",
    "Aslı" -> "K", "Derya" -> "K", "Ebru" -> "K", "Seda" -> "K")

  /** home.py Gender enrich: first token of the name column, looked
    * up in a broadcast dimension.
    */
  def gender(df: DataFrame, nameCol: String,
             lookup: Seq[(String, String)] = defaultGenderSeed): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    genderFromTable(df, nameCol, lookup.toDF("name", "gender"), "name", "gender")
  }

  /** Gender enrich against an ARBITRARY dimension DataFrame — the
    * supported way to run with the reference's full 12,826-entry
    * name→gender catalog (TR_name_gender.py:1-12826): load it (or any
    * external TSV/CSV/parquet of any size) with `spark.read` and pass
    * it here, instead of baking a data table into code. Broadcast
    * hash join while the dim is broadcast-sized; beyond that Spark
    * falls back to a shuffle join on the name key — both correct, and
    * the fact side never collects.
    */
  def genderFromTable(df: DataFrame, nameCol: String, dim: DataFrame,
                      dimNameCol: String = "name",
                      dimGenderCol: String = "gender"): DataFrame = {
    val d = dim.select(col(dimNameCol).as("_first_name"),
      col(dimGenderCol).as("gender"))
    df.withColumn("_first_name", split(trim(col(nameCol)), " ").getItem(0))
      .join(broadcast(d), Seq("_first_name"), "left")
      .drop("_first_name")
  }

  /** home.py:1719-1891 Latitude-Longitude enrich: city → (lat, lon)
    * broadcast lookup; seed covers the largest TR provinces, callers
    * supply full tables.
    */
  val defaultGeoSeed: Seq[(String, Double, Double)] = Seq(
    ("İstanbul", 41.0082, 28.9784), ("Ankara", 39.9334, 32.8597),
    ("İzmir", 38.4192, 27.1287), ("Bursa", 40.1885, 29.0610),
    ("Antalya", 36.8969, 30.7133), ("Adana", 37.0000, 35.3213),
    ("Konya", 37.8667, 32.4833), ("Gaziantep", 37.0662, 37.3833),
    ("Kayseri", 38.7312, 35.4787), ("Mersin", 36.8000, 34.6333))

  def geo(df: DataFrame, cityCol: String,
          lookup: Seq[(String, Double, Double)] = defaultGeoSeed): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    geoFromTable(df, cityCol, lookup.toDF("city", "latitude", "longitude"),
      "city", "latitude", "longitude")
  }

  /** Geo enrich against an arbitrary dimension DataFrame (e.g. the
    * reference's 81-province lat/lon table, home.py:1719-1891, loaded
    * from an external file) — same contract as [[genderFromTable]].
    */
  def geoFromTable(df: DataFrame, cityCol: String, dim: DataFrame,
                   dimCityCol: String = "city",
                   latCol: String = "latitude",
                   lonCol: String = "longitude"): DataFrame = {
    val d = dim.select(col(dimCityCol).as("_city"),
      col(latCol).as("latitude"), col(lonCol).as("longitude"))
    df.join(broadcast(d), col(cityCol) === col("_city"), "left")
      .drop("_city")
  }
}
