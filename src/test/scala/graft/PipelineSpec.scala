package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Pipeline

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("withSplit assigns all three labels, deterministically and partition-invariantly") {
    val df = (1 to 600).map(i => s"document number $i").toDF("text")
    def counts(parts: Int): Map[String, Long] =
      Pipeline.withSplit(df.repartition(parts), "text")
        .groupBy("split").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val c7 = counts(7)
    assert(counts(3) == c7, "split must not depend on partitioning")
    assert(c7.keySet == Set("train", "val", "test"))
    assert(c7("train") > c7("val") && c7("train") > c7("test"))
    assert(c7.values.sum == 600)
    // ~80/10/10 with binomial noise
    assert(c7("train") > 420 && c7("train") < 540)
  }

  test("exact duplicate content is co-assigned to the same split") {
    val df = Seq("same doc", "same doc", "other doc").toDF("text")
    val bySplit = Pipeline.withSplit(df, "text")
      .filter(col("text") === "same doc").select("split")
      .collect().map(_.getString(0)).toSet
    assert(bySplit.size == 1)
  }

  test("sampleByHash is deterministic, fraction-accurate, and salt-decorrelated") {
    val df = (1L to 2000L).toDF("id")
    def ids(salt: String): Set[Long] =
      Pipeline.sampleByHash(df, col("id"), 0.2, salt)
        .collect().map(_.getLong(0)).toSet
    val a = ids("a")
    assert(a == ids("a"), "same salt must select the same rows")
    assert(a.size > 300 && a.size < 500, s"got ${a.size} for fraction 0.2")
    val b = ids("b")
    assert(b != a, "different salts must select different row sets")
    // overlap should look independent (~0.04 of 2000), not nested
    assert(a.intersect(b).size < 200)
  }

  test("redactPii masks emails and 10+-digit runs, leaves short numbers") {
    val got = Seq(
      "mail bob.smith@x.co.uk and 12345678901 plus 12345 end",
      "no pii here",
      "UPPER@EXAMPLE.ORG 9999999999")
      .toDF("t").select(Pipeline.redactPii(col("t")).as("r"))
      .collect().map(_.getString(0))
    assert(got(0) == "mail <EMAIL> and <NUM> plus 12345 end")
    assert(got(1) == "no pii here")
    assert(got(2) == "<EMAIL> <NUM>")
  }

  test("packSequences: concat-and-chunk layout, straddling docs, deterministic") {
    // one bucket => one stream ordered by id: tokens 300,300,200 at
    // L=512 -> offsets 0,300,600: doc2 straddles packs 0/1, doc3
    // starts in pack 1 at offset 88
    val df = Seq((1L, 300), (2L, 300), (3L, 200)).toDF("id", "tok")
    val got = Pipeline.packSequences(df, col("id"), col("tok"), 512, buckets = 1)
      .collect().map(r => r.getLong(0) -> (r.getString(2), r.getLong(3))).toMap
    assert(got(1L) == (("0_0", 0L)))
    assert(got(2L) == (("0_0", 300L)))
    assert(got(3L) == (("0_1", 88L))) // (300+300) mod 512
    // multi-bucket: pack ids namespace by bucket, assignment is stable
    val many = (0L until 500L).map(i => (i, 10)).toDF("id", "tok")
    val a = Pipeline.packSequences(many, col("id"), col("tok"), 128, buckets = 4)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val b = Pipeline.packSequences(many, col("id"), col("tok"), 128, buckets = 4)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a == b)
    assert(a.values.map(_.split("_")(0)).toSet.size == 4, "all four bucket streams used")
  }

  test("stratifiedSampleByHash: per-stratum quotas, deterministic, default fraction") {
    val df = (0L until 3000L).map(i => (i, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c"))
      .toDF("id", "s")
    val kept = Pipeline.stratifiedSampleByHash(
      df, col("id"), col("s"), Map("a" -> 0.5, "b" -> 0.05), defaultFraction = 1.0)
    val counts = kept.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("a") - 500L) < 80, s"~50% of stratum a: $counts")
    assert(math.abs(counts("b") - 50L) < 40, s"~5% of stratum b: $counts")
    assert(counts("c") == 1000L, "default 1.0 keeps every c row")
    // determinism: identical kept set on re-evaluation
    val again = Pipeline.stratifiedSampleByHash(
      df, col("id"), col("s"), Map("a" -> 0.5, "b" -> 0.05), defaultFraction = 1.0)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == kept.select("id").collect().map(_.getLong(0)).toSet)
  }

  test("samplePerStratum: exact quota per stratum, deterministic, partition-invariant") {
    val df = (1 to 100).map(i => (i.toLong, s"src${i % 3}")).toDF("id", "src")
    def pick(parts: Int): Seq[(String, Long)] =
      Pipeline.samplePerStratum(df.repartition(parts), col("src"), col("id"), 4)
        .collect().map(r => (r.getString(1), r.getLong(0))).toSeq.sorted
    val p3 = pick(3)
    assert(pick(7) == p3, "sample must not depend on partitioning")
    assert(p3.groupBy(_._1).forall(_._2.size == 4))
    // a stratum smaller than k returns whole
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "src")
    val got = Pipeline.samplePerStratum(tiny, col("src"), col("id"), 5)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L))
  }

  test("tokenBudgetFractions: caps at 1.0, hits the budget in expectation, temperature extremes") {
    val df = Seq(("big", 8000L), ("small", 100L), ("mid", 1900L)).toDF("src", "toks")
    // temperature 1.0 (proportional): every source gets budget/total
    val prop = Pipeline.tokenBudgetFractions(df, col("toks"), col("src"), 5000, 1.0)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(prop.values.toSet == Set(0.5), s"proportional: $prop") // 5000/10000
    // budget >= corpus: everything kept whole
    val all = Pipeline.tokenBudgetFractions(df, col("toks"), col("src"), 20000, 1.0)
      .collect().map(_.getDouble(2)).toSet
    assert(all == Set(1.0))
    // temperature 0: uniform target budget/3 per source; "small" (100
    // tokens) is taken whole, others get (5000/3)/tokens
    val uni = Pipeline.tokenBudgetFractions(df, col("toks"), col("src"), 5000, 0.0)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(uni("small") == 1.0)
    assert(math.abs(uni("big") - 5000.0 / 3 / 8000) < 1e-4, s"uniform: $uni")
    // temperature 0.5 upweights the small source vs proportional
    val half = Pipeline.tokenBudgetFractions(df, col("toks"), col("src"), 5000, 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(half("small") > prop("small") && half("big") < uni("big") + 1.0)
  }
}
