package graft

import graft.multimodal.{Fixtures, ImageHash, Multimodal}

class ImageHashSpec extends SparkSpec {
  import spark.implicits._

  private def png(img: java.awt.image.BufferedImage) = Fixtures.encodePng(img)
  private val gradient = png(Fixtures.gradientImage(64, 64))
  private val checker = png(Fixtures.checkerImage(64, 64, 8))

  test("dHash: deterministic, None on corrupt payloads") {
    val h1 = ImageHash.dHash(gradient)
    val h2 = ImageHash.dHash(gradient)
    assert(h1.isDefined && h1 == h2)
    assert(ImageHash.dHash(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("dHash survives rescaling (2x upscale re-encoded) within a few bits") {
    val up = png(Multimodal.ImageCodec.resampleRgb(
      Multimodal.ImageCodec.decode(gradient), 128, 128))
    val d = java.lang.Long.bitCount(
      ImageHash.dHash(gradient).get ^ ImageHash.dHash(up).get)
    assert(d <= 4, s"rescaled copy drifted $d bits")
  }

  test("unrelated structures are far apart") {
    val d = java.lang.Long.bitCount(
      ImageHash.dHash(gradient).get ^ ImageHash.dHash(checker).get)
    assert(d > 10, s"gradient vs checker only $d bits apart")
  }

  test("nearDupPairs: identical + rescaled match, unrelated + corrupt excluded") {
    val up = png(Multimodal.ImageCodec.resampleRgb(
      Multimodal.ImageCodec.decode(gradient), 128, 128))
    val corpus = Seq(
      (1L, gradient), (2L, gradient), (3L, up),
      (4L, checker), (5L, Array[Byte](9, 9))).toDF("id", "content")
    val hashes = ImageHash.dHashes(corpus, "id", "content")
    assert(hashes.count() == 4) // corrupt excluded
    val pairs = ImageHash.nearDupPairs(hashes, maxHamming = 6)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(pairs(0)._3 == 0) // byte-identical copy
  }

  test("banding is recall-complete at the boundary (hamming exactly maxHamming)") {
    // synthetic hashes: flip exactly k bits and require the pair to
    // survive for every k <= maxHamming and vanish for k above
    val base = 0x0123456789abcdefL
    for (k <- Seq(1, 3, 6, 7)) {
      val flipped = (0 until k).foldLeft(base)((h, i) => h ^ (1L << (i * 9)))
      val hashes = Seq((1L, base), (2L, flipped)).toDF("id", "dhash")
      val n = ImageHash.nearDupPairs(hashes, maxHamming = 6).count()
      assert(n == (if (k <= 6) 1L else 0L), s"k=$k")
    }
  }
}
