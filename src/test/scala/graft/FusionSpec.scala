package graft

import graft.ann.Fusion

class FusionSpec extends SparkSpec {
  import spark.implicits._

  private def sys(rows: (Long, Long, Long)*) =
    rows.toDF("query_id", "rank", "doc_id")

  test("hand-computed RRF over two systems (integer micro contributions)") {
    val a = sys((1L, 1L, 1L), (1L, 2L, 2L), (1L, 3L, 3L))
    val b = sys((1L, 1L, 3L), (1L, 2L, 1L), (1L, 3L, 4L))
    val got = Fusion.rrfFuse(Seq(a, b), 10)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    def c(r: Long) = 1000000L / (60L + r)
    val want = Seq(
      (1L, 1L, c(1) + c(2)),   // d1: A rank1 + B rank2
      (2L, 3L, c(3) + c(1)),   // d3: A rank3 + B rank1
      (3L, 2L, c(2)),          // d2: A only
      (4L, 4L, c(3)))          // d4: B only
    assert(got == want)
  }

  test("within-system duplicates count once at their BEST rank") {
    val a = sys((1L, 2L, 7L), (1L, 5L, 7L), (1L, 1L, 8L))
    val got = Fusion.rrfFuse(Seq(a), 10)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toMap
    assert(got(7L) == 1000000L / 62L)
    assert(got(8L) == 1000000L / 61L)
  }

  test("single system is rank-preserving; k truncates") {
    val a = sys((1L to 9L).map(r => (1L, r, 100L + r)): _*)
    val got = Fusion.rrfFuse(Seq(a), 4)
      .collect().sortBy(_.getLong(1)).map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq == (1L to 4L).map(r => (r, 100L + r)))
  }

  test("equal fused scores tie-break on doc_id ascending") {
    val a = sys((1L, 1L, 9L))
    val b = sys((1L, 1L, 5L))
    val got = Fusion.rrfFuse(Seq(a, b), 10)
      .collect().sortBy(_.getLong(1)).map(_.getLong(2))
    assert(got.toSeq == Seq(5L, 9L))
  }

  test("empty system list refused loud") {
    intercept[IllegalArgumentException] {
      Fusion.rrfFuse(Seq.empty, 5)
    }
  }
}
