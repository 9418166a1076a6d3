package graft

import org.apache.spark.sql.functions._
import graft.ann.Quantize
import graft.dedup.Dedup
import graft.sources.{Hilbert, Zorder}
import graft.functions.{CountMinAgg, CountMinEstimate}

/** Round-15 regression specs for the r14 advice findings: each test
  * encodes the exact failure scenario the advisor described and proves
  * the fix closes it.
  */
class R15FixSpec extends SparkSpec {
  import spark.implicits._

  test("Hilbert/Zorder bucketing survives an int column with a wide value range") {
    // pre-fix: (v - min) * 2^16 overflows int for range > ~2^15 under ANSI
    val df = Seq((0, 5), (1000000000, 7), (2000000000, 9), (-2000000000, 3))
      .toDF("a", "b")
    val h = Hilbert.withHilbertValue(df, "a", "b", bits = 16)
      .agg(count(col("h_value")), min(col("h_value")), max(col("h_value"))).head
    assert(h.getLong(0) == 4L)
    assert(h.getLong(1) >= 0L && h.getLong(2) < (1L << 32))
    val z = Zorder.withZValue(df, "a", "b", bits = 16)
      .agg(count(col("z_value"))).head
    assert(z.getLong(0) == 4L)
  }

  test("CountMinAgg hashes dates by their ISO display string") {
    val df = Seq(java.sql.Date.valueOf("2023-07-14"),
      java.sql.Date.valueOf("2023-07-14"),
      java.sql.Date.valueOf("2024-01-01")).toDF("d")
    val sk = df.agg(CountMinAgg(col("d"), 5, 1024, 42).as("sk"))
    val est = sk.select(
      CountMinEstimate(col("sk"), lit("2023-07-14")).as("hit"),
      CountMinEstimate(col("sk"), lit("19552")).as("internal")).head
    assert(est.getLong(0) == 2L, "natural date-string probe must match ingested key")
    // the internal days-since-epoch rendering must NOT be the hashing domain
    assert(est.getLong(1) == 0L)
  }

  test("CountMinAgg rejects timestamp columns at analysis time") {
    val df = Seq(java.sql.Timestamp.valueOf("2023-07-14 10:00:00")).toDF("t")
    val e = intercept[Exception] {
      df.agg(CountMinAgg(col("t"), 5, 64, 1).as("sk")).collect()
    }
    assert(e.getMessage.contains("timezone-independent") ||
      e.getMessage.toLowerCase.contains("cannot resolve"))
  }

  test("signCodes packs a NaN dimension identically to signCodesLocal") {
    val v = Array(Double.NaN, 1.0, -1.0, Double.NaN)
    val local = Quantize.signCodesLocal(v)
    val sql = Seq(Tuple1(v.map(_.toFloat))).toDF("v")
      .select(Quantize.signCodes(col("v"), 4).as("c"))
      .head.getSeq[Long](0).toArray
    assert(sql.sameElements(local), s"sql=${sql.toSeq} local=${local.toSeq}")
    assert(local(0) == 2L) // only dim 1 (value 1.0) sets its bit
  }

  test("mergeNearIndexes raises loudly on a band-geometry mismatch") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    val a = Dedup.minhashIndex(docs, "text", "doc_id", bands = 32, rowsPerBand = 4)
    val b = Dedup.minhashIndex(docs, "text", "doc_id", bands = 16, rowsPerBand = 4)
    val e = intercept[Exception] {
      Dedup.mergeNearIndexes(a, b).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("incompatible band geometry")))
    // compatible geometry still merges cleanly
    assert(Dedup.mergeNearIndexes(a,
      Dedup.minhashIndex(docs, "text", "doc_id", bands = 32, rowsPerBand = 4))
      .count() == 2L)
  }
}
