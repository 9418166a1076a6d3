package graft

import org.apache.spark.sql.functions._
import graft.operators.Rank

class RankSpec extends SparkSpec {
  import spark.implicits._

  private val df = (1L to 500L)
    .map(i => (i, (i * 7919) % 40, s"v$i")) // heavy ties in the sort key
    .toDF("id", "key", "payload")

  test("globalRank equals the single-window row_number under the same total order") {
    val got = Rank.globalRank(df, Seq(col("key").desc), col("id"), partitions = 7)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    val want = df.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, k) => (-k, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> i.toLong }.toMap
    assert(got == want)
  }

  test("rank values independent of the partition count") {
    def run(p: Int) = Rank.globalRank(df, Seq(col("key").desc), col("id"), p)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(run(1) == run(3))
    assert(run(3) == run(13))
    assert(run(3) == run(0)) // default partitioning
  }

  test("ranks are a dense 0..n-1 permutation even with cross-boundary ties") {
    val ranks = Rank.globalRank(df, Seq(col("key")), col("id"), 11)
      .collect().map(r => r.getLong(3)).sorted
    assert(ranks.toSeq == (0L until 500L).toSeq)
  }

  test("assignStableIds: 1-based, reproducible, follows the sort") {
    val ids = Rank.assignStableIds(df, Seq(col("key"), col("payload")),
      col("id"), 5)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(ids.map(_._2).sorted.toSeq == (1L to 500L).toSeq)
    val again = Rank.assignStableIds(df.repartition(9),
      Seq(col("key"), col("payload")), col("id"), 5)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(ids.toMap == again)
  }

  test("empty sort spec refused; empty frame yields empty ranks") {
    intercept[IllegalArgumentException] {
      Rank.globalRank(df, Seq.empty, col("id"))
    }
    val empty = Rank.globalRank(df.filter(col("id") < 0),
      Seq(col("key")), col("id"))
    assert(empty.count() == 0)
  }
}
