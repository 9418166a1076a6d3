package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Pipeline

class InterleaveSpec extends SparkSpec {
  import spark.implicits._

  test("hand example: 2-vs-4 sources interleave at their fractions") {
    val df = Seq(("A", 1L), ("A", 2L), ("B", 11L), ("B", 12L), ("B", 13L),
      ("B", 14L)).toDF("src", "id")
    val got = Pipeline.interleaveBySource(df, col("src"), col("id"))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // A (q=2): positions (2r+1)/4 -> 250e9, 750e9; B (q=4): (2r+1)/8
    val wantA = Seq(250000000000L, 750000000000L)
    val wantB = Seq(125000000000L, 375000000000L, 625000000000L, 875000000000L)
    assert(got.filter(_._1 == "A").sortBy(_._2).map(_._4).toSeq == wantA)
    assert(got.filter(_._1 == "B").sortBy(_._2).map(_._4).toSeq == wantB)
    // global order B A B B A B — every source spread across the schedule
    val order = got.sortBy(t => (t._4, t._1)).map(_._1).mkString
    assert(order == "BABBAB")
  }

  test("prefix proportionality: every prefix holds each source's share within 2") {
    val df = ((1L to 60L).map(i => ("big", i)) ++
      (1L to 20L).map(i => ("mid", 100 + i)) ++
      (1L to 5L).map(i => ("rare", 200 + i))).toDF("src", "id")
    val rows = Pipeline.interleaveBySource(df, col("src"), col("id"))
      .collect().map(r => (r.getString(0), r.getLong(4), r.getLong(1)))
      .sortBy(t => (t._2, t._1, t._3))
    val n = rows.length.toDouble
    val share = Map("big" -> 60 / 85.0, "mid" -> 20 / 85.0, "rare" -> 5 / 85.0)
    for (k <- 1 to rows.length; (src, expected) <- share) {
      val gotCnt = rows.take(k).count(_._1 == src)
      assert(math.abs(gotCnt - k * expected) <= 2.0,
        s"prefix $k source $src: $gotCnt vs ${k * expected}")
    }
  }

  test("deterministic across partitionings") {
    val df = (1L to 300L).map(i => (s"s${i % 4}", i)).toDF("src", "id")
    def run(parts: Int) = Pipeline.interleaveBySource(
      df.repartition(parts), col("src"), col("id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(4))).sortBy(t => (t._1, t._2)).toSeq
    assert(run(1) == run(7))
  }

  test("null sources group together and survive (no silent equi-join drop)") {
    val df = Seq((Some("a"), 1L), (None, 2L), (None, 3L), (Some("a"), 4L))
      .toDF("src", "id")
    val got = Pipeline.interleaveBySource(df, col("src"), col("id"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(3)))
    assert(got.length == 4)
    val nulls = got.filter(_._1.isEmpty)
    assert(nulls.map(_._2).toSet == Set(2L, 3L))
    assert(nulls.forall(_._3 == 2L)) // q counts the null group
  }

  test("interleaveKey exact at 2q > 2e6 (the scale-6 decimal mis-floor regime)") {
    val cases = Seq((0L, 3000000L), (1499999L, 3000000L), (2999999L, 3000000L),
      (123456789L, 987654321L), (987654320L, 987654321L))
    val got = cases.toDF("r", "q")
      .select(Pipeline.interleaveKey(col("r"), col("q")).as("k"))
      .collect().map(_.getLong(0)).toSeq
    val want = cases.map { case (r, q) =>
      ((BigInt(2) * r + 1) * BigInt("1000000000000") / (BigInt(2) * q)).toLong
    }
    assert(got == want)
  }
}
