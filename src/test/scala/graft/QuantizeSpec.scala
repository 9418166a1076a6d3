package graft

import org.apache.spark.sql.functions._
import graft.ann.{Ann, Quantize}

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed codes; zero vector quantizes to null") {
    val df = Seq(
      (1L, Array(1.0f, -0.5f, 0.25f, 0f)),
      (2L, Array(0f, 0f, 0f, 0f)))
      .toDF("id", "v")
    val got = Quantize.quantizeInt8(df, "id", "v").collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    val (s1, q1) = got(1L)
    assert(s1.contains(1000000L))
    assert(q1.get.asInstanceOf[scala.collection.Seq[Int]].toSeq ==
      Seq(127, -64, 32, 0))
    assert(got(2L) == ((None, None)))
  }

  test("scale invariance: codes identical for a scalar multiple of the vector") {
    val base = Array(0.3f, -0.9f, 0.11f, 0.77f, -0.02f)
    val df = Seq((1L, base), (2L, base.map(_ * 2.5f))).toDF("id", "v")
    val codes = Quantize.quantizeInt8(df, "id", "v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](2)).toMap
    assert(codes(1L) == codes(2L))
  }

  test("intDot exact; int8 cosine within 2% of float cosine on random vectors") {
    val vs = (1L to 30L).map(i =>
      (i, Array.tabulate(16)(j => (((i * 37 + j * 11) % 19).toFloat - 9) / 9f)))
    val df = vs.toDF("id", "v")
    val q = Quantize.quantizeInt8(df, "id", "v")
    val pairs = q.as("a").join(q.as("b"),
        col("a.id") < col("b.id"))
      .select(col("a.id").as("ia"), col("b.id").as("ib"),
        Quantize.intDot(col("a.codes"), col("b.codes")).as("dot"),
        Quantize.int8CosineMicro(col("a.codes"), col("b.codes")).as("qc"))
      .collect()
    val vmap = vs.toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    def codesOf(a: Array[Float]): Array[Long] = {
      val m = a.map(x => math.abs(x.toDouble)).max
      a.map(x => math.round(x.toDouble / m * 127))
    }
    for (r <- pairs) {
      val (ia, ib) = (r.getLong(0), r.getLong(1))
      val ca = codesOf(vmap(ia)); val cb = codesOf(vmap(ib))
      assert(r.getLong(2) == ca.zip(cb).map { case (x, y) => x * y }.sum,
        s"dot $ia,$ib")
      assert(math.abs(r.getLong(3) - cos(vmap(ia), vmap(ib)) * 1e6) < 20000,
        s"cos $ia,$ib")
    }
  }

  test("int8 top-k recall: quantized retrieval agrees with exact top-5 on 9 of 10") {
    val corpus = (1L to 200L).map(i =>
      (i, Array.tabulate(24)(j => (((i * 53 + j * 29) % 31).toFloat - 15) / 15f)))
      .toDF("vec_id", "embedding")
    val q = Quantize.quantizeInt8(corpus, "vec_id", "embedding")
    val queries = corpus.filter(col("vec_id").isin(7L, 99L))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val exact = Ann.batchTopK(corpus, "vec_id", "embedding",
      queries, "qid", "qv", 5).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val qq = Quantize.quantizeInt8(
      queries.withColumnRenamed("qid", "vec_id")
        .withColumnRenamed("qv", "embedding"), "vec_id", "embedding")
      .select(col("vec_id").as("qid"), col("codes").as("qcodes"))
    val approx = q.select(col("vec_id").as("id"), col("codes"))
      .crossJoin(broadcast(qq))
      .select(col("qid"), col("id"),
        Quantize.int8CosineMicro(col("codes"), col("qcodes")).as("s"))
      .filter(col("s").isNotNull)
      .groupBy("qid")
      .agg(graft.functions.TopKPairsAgg(col("s"), col("id"), 5).as("t"))
      .select(col("qid"), explode(col("t")).as("e"))
      .select(col("qid"), col("e.id"))
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    for ((qid, want) <- exact)
      assert((approx(qid) & want).size >= 4, s"recall for $qid")
  }
}
