package graft

import org.apache.spark.sql.functions._
import graft.ann.Ann
import graft.text.TextAnalysis

class AnnTextSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vectors: Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(11)
    (0L until 100L).map(i => i -> Array.fill(16)(rnd.nextGaussian().toFloat))
  }

  private def bruteCos(q: Array[Double]): Seq[(Long, Double)] = {
    def cos(a: Array[Float]): Double = {
      val dot = a.zip(q).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nq = math.sqrt(q.map(x => x * x).sum)
      dot / (na * nq)
    }
    vectors.map { case (id, v) =>
      id -> BigDecimal(cos(v)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.sortBy { case (id, c) => (-c, id) }
  }

  test("cosineTopK equals brute-force ranking") {
    val df = vectors.toDF("vec_id", "embedding")
    val q = vectors.head._2.map(_.toDouble)
    val got = Ann.cosineTopK(df, "embedding", "vec_id", q, 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == bruteCos(q).take(10))
    assert(got.head._1 == 0L && got.head._2 == 1.0) // self-match first
  }

  test("cosinePairsExact finds every brute-force pair against the subset, regardless of buckets") {
    val df = vectors.toDF("vec_id", "embedding")
    val subset = df.filter(col("vec_id") < 10)
    val got = Ann.cosinePairsExact(df, subset, "embedding", "vec_id", 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val brute = (for {
      (ia, va) <- vectors; (ib, vb) <- vectors if ia < ib && ib < 10
      dot = va.zip(vb).map { case (x, y) => x.toDouble * y.toDouble }.sum
      na = math.sqrt(va.map(x => x.toDouble * x).sum)
      nb = math.sqrt(vb.map(x => x.toDouble * x).sum)
      c = BigDecimal(dot / (na * nb)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if c >= 0.3
    } yield (ia, ib, c)).toSet
    assert(got == brute && got.nonEmpty)
  }

  test("multi-probe LSH recall dominates single-bucket at the same plane family") {
    val df = vectors.toDF("vec_id", "embedding")
    val q = vectors.head._2.map(_.toDouble)
    val single = Ann.lshTopK(df, "embedding", "vec_id", q, 100, planes = 5)
      .collect().map(_.getLong(0)).toSet
    val multi = Ann.lshTopKMultiProbe(df, "embedding", "vec_id", q, 100,
      planes = 5, probes = 3).collect().map(_.getLong(0)).toSet
    assert(single.subsetOf(multi), "probing more buckets must never lose candidates")
    assert(multi.size > single.size, "extra probes should surface extra candidates")
    // scores stay exact: every returned similarity equals brute force
    val brute = bruteCos(q).toMap
    val got = Ann.lshTopKMultiProbe(df, "embedding", "vec_id", q, 100, planes = 5, probes = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    got.foreach { case (id, c) => assert(c == brute(id), s"vec $id") }
  }

  test("trainCentroidsKMeans recovers engineered clusters from first-k seeds") {
    val rnd = new scala.util.Random(5)
    val dirs = Array(
      Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f), Array(0f, 0f, 1f, 0f))
    // ids 0,1,2 land in distinct clusters (they seed the centroids);
    // the rest are noisy members spread across clusters
    val vecs = (0L until 90L).map { i =>
      val d = dirs((i % 3).toInt)
      i -> d.map(x => x + rnd.nextGaussian().toFloat * 0.05f)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val cents = Ann.trainCentroidsKMeans(df, "embedding", "vec_id", 3, iters = 2)
    def cos(a: Array[Double], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    // each centroid aligns tightly with exactly one true direction
    val claimed = cents.map { c =>
      val sims = dirs.map(d => cos(c, d))
      assert(sims.max > 0.98, s"centroid not aligned: ${sims.toSeq}")
      sims.indexOf(sims.max)
    }
    assert(claimed.toSet == Set(0, 1, 2), s"clusters not bijectively claimed: ${claimed.toSeq}")
  }

  test("trainCentroidsKMeans survives k=1 and null embeddings (degenerate inputs)") {
    // r2 regression: k=1 crashed in single-argument greatest(), and a
    // null vector NPE'd the assignment collect; the native
    // NearestCentroid expression + isNotNull pre-filter handle both
    val withNulls = Seq(
      0L -> Some(Array(1f, 0f, 0f, 0f)),
      1L -> Some(Array(0.9f, 0.1f, 0f, 0f)),
      2L -> (None: Option[Array[Float]]),
      3L -> Some(Array(0.8f, 0.2f, 0f, 0f))).toDF("vec_id", "embedding")
    val k1 = Ann.trainCentroidsKMeans(withNulls, "embedding", "vec_id", 1, iters = 2)
    assert(k1.length == 1 && k1(0).length == 4)
    // the single centroid converges to the mean of the non-null vectors
    assert(math.abs(k1(0)(0) - (1.0 + 0.9 + 0.8) / 3) < 1e-6)
    // empty input: no centroids rather than a crash
    assert(Ann.trainCentroidsKMeans(
      Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding"),
      "embedding", "vec_id", 3).isEmpty)
  }

  test("lshTopK returns a subset of true neighbors with exact scores") {
    val df = vectors.toDF("vec_id", "embedding")
    val q = vectors.head._2.map(_.toDouble)
    val brute = bruteCos(q).toMap
    val got = Ann.lshTopK(df, "embedding", "vec_id", q, 10, planes = 3).collect()
    assert(got.nonEmpty)
    got.foreach(r => assert(brute(r.getLong(0)) == r.getDouble(1)))
  }

  test("ivfTopK probes nearest centroids and scores exactly") {
    val df = vectors.toDF("vec_id", "embedding")
    val q = vectors.head._2.map(_.toDouble)
    val cents = Ann.trainCentroidsBySample(df, "embedding", "vec_id", 8)
    val brute = bruteCos(q).toMap
    val got = Ann.ivfTopK(df, "embedding", "vec_id", cents, q, 5, nprobe = 3).collect()
    assert(got.nonEmpty)
    got.foreach(r => assert(brute(r.getLong(0)) == r.getDouble(1)))
  }

  test("cosinePairs multi-table banded LSH: recall 1.0 on injected dups at 4096 buckets/table") {
    // defaults: planes=12, tables=4 — far beyond the 16-bucket r2
    // shape. An identical vector pair agrees with EVERY hyperplane,
    // so it collides in every table and recall on re-ingested
    // duplicates is exactly 1 no matter how deep the keys prune.
    val dup = vectors ++ vectors.take(8).map { case (id, v) => (id + 1000) -> v }
    val df = dup.toDF("vec_id", "embedding")
    val got = Ann.cosinePairs(df, "embedding", "vec_id", 0.999, dim = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 8L).foreach(i => assert(got.contains((i, i + 1000)), s"dup $i"))
    // scaled copies (cosine exactly 1, different coordinates) also
    // land in identical buckets — sign pattern is scale-invariant
    val scaled = vectors ++ vectors.take(4).map { case (id, v) => (id + 2000) -> v.map(_ * 3) }
    val got2 = Ann.cosinePairs(scaled.toDF("vec_id", "embedding"),
      "embedding", "vec_id", 0.999, dim = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 4L).foreach(i => assert(got2.contains((i, i + 2000)), s"scaled dup $i"))
  }

  test("repetitionMetrics: top word and 2-gram token shares") {
    val df = Seq(
      (1L, "spam spam spam ham"),        // top word 3/4; top 2-gram "spam spam" 2/3
      (2L, "all words are different"),   // 1/4; 2-grams all unique 1/3
      (3L, "solo")).toDF("doc_id", "text") // single token: no 2-grams
    val got = graft.text.TextAnalysis.repetitionMetrics(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), if (r.isNullAt(3)) -1.0 else r.getDouble(3))).toMap
    assert(got(1L) == ((4L, 0.75, 0.6667)))
    assert(got(2L) == ((4L, 0.25, 0.3333)))
    assert(got(3L) == ((1L, 1.0, -1.0))) // null 2-gram share
  }

  test("token counts: whitespace and BPE-ish") {
    val r = Seq("Hello, world! It's 42.").toDF("t")
      .select(TextAnalysis.wordCount(col("t")).as("w"),
        TextAnalysis.tokenCount(col("t")).as("b")).collect()(0)
    assert(r.getAs[Int]("w") == 4)
    // tokens: Hello , world ! It ' s 42 . => 9
    assert(r.getAs[Int]("b") == 9)
  }

  test("languageId identifies simple sentences by stopwords/script") {
    val cases = Seq(
      "the cat sat on the mat and it is happy" -> "en",
      "el perro y la casa de los niños es una maravilla" -> "es",
      "der hund und die katze ist nicht ein problem mit von" -> "de",
      "le chat et la maison est une merveille pour les enfants du pays" -> "fr",
      "这是一个中文句子" -> "zh",
      "xyzzy qwerty" -> "und")
    val got = cases.map(_._1).toDF("t")
      .select(col("t"), TextAnalysis.languageId(col("t")).as("l")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (t, exp) => assert(got(t) == exp, s"langid '$t'") }
  }

  test("fingerprint is stable under whitespace/case formatting") {
    val df = Seq("Hello   World", "hello world", "different").toDF("t")
      .select(TextAnalysis.fingerprintMd5(col("t")).as("f")).collect().map(_.getString(0))
    assert(df(0) == df(1) && df(0) != df(2))
  }

  test("quality features and score computed per doc") {
    val r = TextAnalysis.profile(
      Seq((1L, "the quick brown fox jumps over the lazy dog")).toDF("id", "text"),
      "text", "id").collect()(0)
    assert(r.getAs[Long]("n_chars") == 43)
    assert(r.getAs[Int]("n_words") == 9)
    assert(r.getAs[String]("lang_pred") == "en")
    assert(r.getAs[Double]("quality_score") == 1.0)
  }

  test("PQ: sample vectors encode to their own codes; ADC of a sample vector to itself is 0") {
    import spark.implicits._
    // 4-dim vectors, m=2 subspaces of 2; first two vectors seed the
    // codebooks and are designed with distinct, well-separated halves
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 5.0f, 0.0f)),
      (1L, Array(0.0f, 3.0f, 0.0f, 7.0f)),
      (2L, Array(1.0f, 0.1f, 0.0f, 6.9f)) // halves nearest to c0 then c1
    ).toDF("vec_id", "embedding")
    val cb = graft.ann.Pq.codebooksBySample(emb, "embedding", "vec_id", m = 2, k = 2, dim = 4)
    val codes = graft.ann.Pq.encode(emb, "embedding", "vec_id", cb)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(codes(0L) == ((0, 0)) && codes(1L) == ((1, 1)), s"sample self-codes: $codes")
    assert(codes(2L) == ((0, 1)), s"mixed vector: $codes")
    // query = sample vector 0: its ADC to code (0,0) is exactly 0
    val top = graft.ann.Pq.adcTopK(
      graft.ann.Pq.encode(emb, "embedding", "vec_id", cb), "vec_id", cb,
      Array(1.0, 0.0, 5.0, 0.0), k = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(top.head == ((0L, 0.0)), s"self-distance must be 0: ${top.toSeq}")
    assert(top.map(_._1).toSeq == Seq(0L, 2L, 1L), s"ADC order: ${top.toSeq}")
  }

  test("NearestCentroidL2 breaks exact ties by the EARLIER centroid index") {
    import spark.implicits._
    val emb = Seq((1L, Array(2.0f, 2.0f))).toDF("vec_id", "embedding")
    val dup = Array(Array(1.0, 1.0), Array(1.0, 1.0)) // identical centroids
    val got = emb.select(graft.functions.NearestCentroidL2(
      org.apache.spark.sql.functions.col("embedding"), dup, 0, 2).as("c"))
      .collect()(0).getInt(0)
    assert(got == 0)
  }
}
