package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** String-similarity duplicate detector (reference: home.py:265-270,
  * backed by the `string_grouper` library = tf-idf over character
  * 3-grams + cosine ≥ min_similarity).
  *
  * Spark-first shape: explode each string into its char-3-gram
  * multiset with tf-idf weights, inverted-index self-join on the
  * gram (shuffle keyed by gram, linear + output-sized), accumulate
  * dot products, divide by the precomputed norms. A
  * document-frequency cap drops grams occurring in more than
  * `dfCap` strings — those only produce noise pairs and are the
  * classic skew source at scale.
  */
object StringSim {

  /** Char n-grams of a (lowercased, space-collapsed) string. */
  def charGrams(c: Column, n: Int): Column = gramsExpr(c, n)

  private def gramsExpr(c: Column, n: Int): Column = {
    val s = regexp_replace(lower(c), "\\s+", " ")
    transform(sequence(lit(1), greatest(length(s) - (n - 1), lit(1))),
      i => s.substr(i, lit(n)))
  }

  /** tf-idf cosine similarity pairs ≥ `minSimilarity` over char
    * 3-grams. Emits (id_a < id_b, similarity). idf = ln(N/df);
    * tf = gram count within the string.
    */
  def similarPairs(df: DataFrame, strCol: String, idCol: String,
                   minSimilarity: Double, n: Int = 3,
                   dfCap: Long = Long.MaxValue): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(strCol).as("s"))
      .filter(col("s").isNotNull)

    // (id, gram, tf) — persisted: the working set for df-counts and
    // weighting (one source scan total)
    val grams = base
      .select(col("id"), explode(gramsExpr(col("s"), n)).as("gram"))
      .groupBy("id", "gram").agg(count(lit(1)).as("tf"))
      .persist()

    // N rides along as a broadcast 1-row cross join instead of a
    // driver-side count(): no action, the whole pipeline stays lazy
    // (ids are distinct in `base`, so count == countDistinct)
    val nDocs = base.agg(count(lit(1)).cast("double").as("_n"))

    // gram document frequency -> idf weight; cap kills stop-grams
    val dfTbl = grams.groupBy("gram").agg(count(lit(1)).as("df_"))
      .filter(col("df_") <= dfCap)
      .crossJoin(broadcast(nDocs))
      .withColumn("idf", log(col("_n") / col("df_")))
      .drop("_n")

    val weighted = grams.join(dfTbl, "gram")
      .select(col("id"), col("gram"), (col("tf") * col("idf")).as("w"))

    val norms = weighted.groupBy("id")
      .agg(sqrt(sum(col("w") * col("w"))).as("norm"))

    val a = weighted.select(col("gram"), col("id").as("id_a"), col("w").as("w_a"))
    val b = weighted.select(col("gram"), col("id").as("id_b"), col("w").as("w_b"))
    val dots = a.join(b, "gram")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(sum(col("w_a") * col("w_b")).as("dot"))

    dots
      .join(norms.withColumnRenamed("id", "id_a").withColumnRenamed("norm", "norm_a"), "id_a")
      .join(norms.withColumnRenamed("id", "id_b").withColumnRenamed("norm", "norm_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        round(col("dot") / (col("norm_a") * col("norm_b")), 4).as("similarity"))
      .filter(col("similarity") >= minSimilarity)
  }
}
