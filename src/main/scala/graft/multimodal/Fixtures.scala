package graft.multimodal

/** Deterministic media fixture generators for the REAL-codec
  * correctness gates (q_d13b/q_d13c): tiny payloads built on the
  * driver from pure arithmetic, so the expected feature vectors can
  * be pinned as literal VALUES in the SQL oracle.
  *
  * Determinism chain: the image fixture sets exact integer RGB
  * values and PNG is lossless, so whatever `ImageIO`'s encoder emits
  * decodes back to the identical pixel grid; features then depend
  * only on [[Multimodal.ImageCodec]]'s fixed-order double
  * arithmetic. The WAV fixture writes exact 16-bit PCM samples and
  * the decoder recovers them bit-for-bit. Feature values are rounded
  * to 6 decimals in the gate query, leaving ~9 orders of magnitude
  * of slack over any platform `math.sin` ulp variance.
  */
object Fixtures {

  /** Two-tone gradient image (same construction as the codec spec):
    * left half a vertical luminance ramp, right half near-black, blue
    * channel a horizontal ramp — non-trivial luminance histogram AND
    * edge-orientation bins.
    */
  def gradientImage(w: Int, h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = if (x < w / 2) (255 * y) / math.max(h - 1, 1) else 32
      img.setRGB(x, y, (v << 16) | ((255 - v) << 8) | (x * 255 / math.max(w - 1, 1)))
    }
    img
  }

  /** 8×8-cell checkerboard — maximal contrast, axis-aligned edges. */
  def checkerImage(w: Int, h: Int, cell: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val on = ((x / cell) + (y / cell)) % 2 == 0
      img.setRGB(x, y, if (on) 0xffffff else 0x000000)
    }
    img
  }

  def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
    try javax.imageio.ImageIO.write(img, "png", ios) finally ios.close()
    baos.toByteArray
  }

  /** 16-bit little-endian PCM sine WAV (same construction as the
    * codec spec).
    */
  def sineWav(freq: Double, rate: Float, secs: Double, amp: Double,
              channels: Int = 1): Array[Byte] = {
    val n = (rate * secs).toInt
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, channels, true, false)
    val data = new Array[Byte](n * 2 * channels)
    for (i <- 0 until n; c <- 0 until channels) {
      // StrictMath: bitwise-identical on every JVM/arch — math.sin may
      // use platform intrinsics, and a 1-ulp flip near a zero crossing
      // survives the .toInt quantization into the pinned oracle vectors
      val v = (StrictMath.sin(2 * StrictMath.PI * freq * i / rate) * amp * 32767).toInt.toShort
      val off = (i * channels + c) * 2
      data(off) = (v & 0xff).toByte
      data(off + 1) = ((v >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** 16-bit mono PCM WAV playing a SEQUENCE of tones (a "melody" —
    * the D88 fingerprint fixtures need spectra that CHANGE over
    * time so landmarks carry alignment information), with
    * `leadSilenceSamples` zero samples prepended. A lead silence
    * that is an exact multiple of [[AudioFingerprint.Hop]] shifts
    * every STFT frame by exactly that many hops, so the delayed
    * copy's landmark set equals the original's with a constant
    * frame offset — the property the gate pins.
    */
  def toneSeqWav(tones: Seq[(Double, Double)], rate: Float, amp: Double,
                 leadSilenceSamples: Int = 0): Array[Byte] = {
    val counts = tones.map { case (_, secs) => (rate * secs).toInt }
    val n = leadSilenceSamples + counts.sum
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val data = new Array[Byte](n * 2) // leading silence stays zeroed
    var off = leadSilenceSamples
    tones.zip(counts).foreach { case ((freq, _), cnt) =>
      for (i <- 0 until cnt) {
        val v = (StrictMath.sin(2 * StrictMath.PI * freq * i / rate) * amp * 32767)
          .toInt.toShort
        data((off + i) * 2) = (v & 0xff).toByte
        data((off + i) * 2 + 1) = ((v >> 8) & 0xff).toByte
      }
      off += cnt
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }
}
