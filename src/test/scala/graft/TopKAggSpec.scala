package graft

import org.apache.spark.sql.functions._
import graft.ann.Ann
import graft.functions.TopKPairsAgg

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("TopKPairsAgg equals sort-take under (score desc, id asc), any partitioning") {
    val rows = (1L to 500L).map(i => (i % 7, (i * 2654435761L) % 1000, i))
    val want = rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(r => (r._2, r._3)).sortBy { case (s, i) => (-s, i) }.take(10)
    }
    for (parts <- Seq(1, 3, 13)) {
      val df = rows.toDF("g", "s", "i").repartition(parts)
      val got = df.groupBy("g").agg(TopKPairsAgg(col("s"), col("i"), 10).as("top"))
        .collect().map { r =>
          r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
            .map(e => (e.getLong(0), e.getLong(1)))
        }.toMap
      assert(got == want, s"parts=$parts")
    }
  }

  test("ties break on smaller id; k larger than group returns all; nulls skipped") {
    val df = Seq((1L, Some(5L), Some(30L)), (1L, Some(5L), Some(10L)),
      (1L, Some(5L), Some(20L)), (1L, None, Some(99L)), (1L, Some(9L), None))
      .toDF("g", "s", "i")
    val got = df.groupBy("g").agg(TopKPairsAgg(col("s"), col("i"), 2).as("top"))
      .collect()(0).getSeq[org.apache.spark.sql.Row](1)
      .map(e => (e.getLong(0), e.getLong(1)))
    assert(got == Seq((5L, 10L), (5L, 20L)))
    val all = df.groupBy("g").agg(TopKPairsAgg(col("s"), col("i"), 100).as("top"))
      .collect()(0).getSeq[org.apache.spark.sql.Row](1).map(e => e.getLong(1))
    assert(all == Seq(10L, 20L, 30L))
  }

  test("batchTopK equals per-query exact cosineTopK; plan has no Window") {
    val dim = 16
    def vec(seed: Long): Array[Float] =
      Array.tabulate(dim)(j => (((seed * 31 + j) % 17).toFloat - 8) / 8f)
    val corpus = (1L to 200L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val queries = Seq(5L, 77L, 140L).map(i => (i, vec(i * 1000 + 3)))
      .toDF("qid", "qv")
    val got = Ann.batchTopK(corpus, "vec_id", "embedding",
      queries, "qid", "qv", 5)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "batch top-k must not rank via a window")
    assert(plan.contains("ObjectHashAggregate"),
      "expected the TypedImperativeAggregate map-side combine")
    val gotMap = got.collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getLong(1))
        .map(r => (r.getLong(2), r.getLong(3))).toSeq).toMap
    for ((q, qv) <- Seq((5L, vec(5003L)), (77L, vec(77003L)), (140L, vec(140003L)))) {
      val want = Ann.cosineTopK(corpus, "embedding", "vec_id",
        qv.map(_.toDouble), 5, scale = 6).collect()
        .map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e6))).toSeq
      assert(gotMap(q) == want, s"query $q")
    }
  }

  test("zero-norm corpus vectors drop out instead of throwing") {
    val corpus = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 0f)), (3L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val queries = Seq((9L, Array(1f, 1f))).toDF("qid", "qv")
    val ids = Ann.batchTopK(corpus, "vec_id", "embedding", queries, "qid", "qv", 10)
      .select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 3L))
  }
}
