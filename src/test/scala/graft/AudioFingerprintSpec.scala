package graft

import org.apache.spark.sql.functions._
import graft.multimodal.{AudioFingerprint => AF, Fixtures}

class AudioFingerprintSpec extends SparkSpec {
  import spark.implicits._

  private val rate = 8000f
  private val melodyA = Seq(500.0 -> 0.2, 900.0 -> 0.2, 1400.0 -> 0.2,
    2100.0 -> 0.2, 600.0 -> 0.2, 1100.0 -> 0.2)
  private val melodyB = Seq(800.0 -> 0.3, 1800.0 -> 0.3, 400.0 -> 0.3,
    2600.0 -> 0.3)

  private def wav(tones: Seq[(Double, Double)], lead: Int = 0) =
    Fixtures.toneSeqWav(tones, rate, 0.5, lead)

  private def corpus = Seq(
    (1L, wav(melodyA)),
    (2L, wav(melodyA)),                    // identical copy
    (3L, wav(melodyA, lead = 5 * AF.Hop)), // 5-hop delayed copy
    (4L, wav(melodyB)),                    // unrelated
    (5L, Array[Byte](1, 2, 3))             // corrupt
  ).toDF("id", "content")

  test("landmarks: deterministic, empty on corrupt/short payloads") {
    val l1 = AF.landmarks(wav(melodyA))
    val l2 = AF.landmarks(wav(melodyA))
    assert(l1.nonEmpty && l1.toSeq == l2.toSeq)
    assert(AF.landmarks(Array[Byte](9, 9)).isEmpty)
    assert(AF.landmarks(Fixtures.toneSeqWav(Seq(440.0 -> 0.01), rate, 0.5)).isEmpty) // < 1 frame
  }

  test("hop-aligned delay shifts every landmark by exactly that many frames") {
    val base = AF.landmarks(wav(melodyA)).toSet
    val delayed = AF.landmarks(wav(melodyA, lead = 5 * AF.Hop))
    // every base landmark reappears at t+5 (the delayed payload may
    // add silence-boundary landmarks of its own)
    val shifted = base.map { case (h, t) => (h, t + 5) }
    assert(shifted.subsetOf(delayed.toSet),
      s"missing ${(shifted -- delayed.toSet).take(5)}")
  }

  test("matchPairs: identical at offset 0, delayed at offset 5, unrelated/corrupt absent") {
    val fp = AF.fingerprints(corpus, "id", "content")
    val pairs = AF.matchPairs(fp, minAligned = 5)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(pairs == Seq((1L, 2L, 0), (1L, 3L, 5), (2L, 3L, 5)),
      s"got $pairs")
  }

  test("truncated prefix copy still matches at offset 0") {
    val full = (1L, wav(melodyA))
    val prefix = (2L, wav(melodyA.take(3)))
    val fp = AF.fingerprints(Seq(full, prefix).toDF("id", "content"), "id", "content")
    val m = AF.matchPairs(fp, minAligned = 5).collect()
    assert(m.length == 1 && m(0).getInt(3) == 0)
  }

  test("df-cap drops ubiquitous hashes before the self-join") {
    val many = (1L to 8L).map(i => (i, wav(melodyA))).toDF("id", "content")
    val fp = AF.fingerprints(many, "id", "content")
    // every hash appears in all 8 docs; maxDf=4 must kill every pair
    assert(AF.matchPairs(fp, minAligned = 1, maxDf = 4).count() == 0)
    assert(AF.matchPairs(fp, minAligned = 5, maxDf = 8).count() == 8L * 7 / 2)
  }
}
