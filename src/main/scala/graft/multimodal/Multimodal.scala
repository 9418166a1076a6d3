package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns next to a typed metadata struct. The
  * Spark-side mechanics — schema, partition-sized batching,
  * mapPartitions signature, deterministic output shape — are real.
  * Two codecs ship behind the `Codec` trait:
  *
  *   - [[ImageCodec]]: a REAL JDK-only image path (`javax.imageio`
  *     PNG/JPEG/BMP/GIF decode → hand-rolled bilinear resample →
  *     luminance + edge-orientation histogram features). No native
  *     libraries needed.
  *   - [[StubCodec]]: a deterministic md5-derived fake that any SQL
  *     engine can recompute — kept as the DEFAULT so the full
  *     plumbing stays end-to-end oracle-checkable (the oracle cannot
  *     run an image decoder).
  *
  * Audio and video are REAL too within JDK reach: [[AudioCodec]]
  * parses WAV/PCM and computes an FFT spectral profile, and
  * [[graft.multimodal.Avi]] demuxes RIFF/AVI MJPEG streams into
  * per-frame JPEGs for [[RealCodec]]. Only inter-frame codecs
  * (H.264, mp3/aac) stay out of scope — they genuinely need native
  * decoder libraries.
  */
object Multimodal {

  case class MediaMeta(format: String, width: Int, height: Int, nBytes: Long)
  case class MediaRow(id: Long, media: Array[Byte], meta: MediaMeta)
  case class FeatureRow(id: Long, format: String, features: Array[Float])

  /** Pluggable decode/feature-extract stage. Swap in a real codec on
    * a cluster with the native libs installed.
    */
  trait Codec extends Serializable {
    def decodeAndFeaturize(bytes: Array[Byte], meta: MediaMeta): Array[Float]
  }

  /** STUB codec: deterministic features derived from the payload
    * bytes — stands in for image decode + resize + embedding. Real
    * deployments implement [[Codec]] over their native libraries.
    * The fake is the first 8 nibbles of md5(payload), scaled to
    * [0, 1] — chosen because any SQL engine can recompute it, so the
    * full multimodal plumbing stays end-to-end oracle-checkable.
    */
  object StubCodec extends Codec {
    def decodeAndFeaturize(bytes: Array[Byte], meta: MediaMeta): Array[Float] = {
      val h = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      Array.tabulate(8) { i =>
        val b = h(i / 2) & 0xff
        val nibble = if (i % 2 == 0) b >>> 4 else b & 0xf
        nibble.toFloat / 15f
      }
    }
  }

  /** REAL image codec, JDK-only (`javax.imageio` ships PNG, JPEG,
    * BMP, GIF readers): decode → bilinear resample to a fixed
    * `grid`×`grid` luminance field → an 18-float feature vector:
    * 8 luminance-histogram bins + 8 Sobel edge-orientation bins
    * (magnitude-weighted) + mean luminance + RMS contrast, all
    * normalized to [0, 1]. The resampler is hand-rolled double
    * arithmetic (not Graphics2D, whose rendering pipeline is not
    * pinned across JDKs), so features are deterministic for a given
    * decoded pixel grid. Undecodable payloads featurize to an EMPTY
    * array — callers filter `size(features) > 0` rather than losing
    * the partition to one corrupt file (at 100 TB there is always
    * one corrupt file).
    */
  class ImageCodec(grid: Int = 32) extends Codec {
    def decodeAndFeaturize(bytes: Array[Byte], meta: MediaMeta): Array[Float] = {
      val img = ImageCodec.decode(bytes)
      if (img == null) return Array.empty[Float]
      val lum = ImageCodec.luminanceGrid(img, grid, grid)
      val n = (grid * grid).toDouble
      // 8-bin luminance histogram
      val hist = new Array[Double](8)
      var i = 0
      var sum = 0.0
      var sumSq = 0.0
      while (i < lum.length) {
        val v = lum(i)
        hist(math.min((v / 32.0).toInt, 7)) += 1.0
        sum += v; sumSq += v * v
        i += 1
      }
      val mean = sum / n
      val rms = math.sqrt(math.max(sumSq / n - mean * mean, 0.0))
      // 8-bin edge-orientation histogram, Sobel, magnitude-weighted
      val edge = new Array[Double](8)
      var magSum = 0.0
      var y = 1
      while (y < grid - 1) {
        var x = 1
        while (x < grid - 1) {
          def l(dx: Int, dy: Int) = lum((y + dy) * grid + (x + dx))
          val gx = (l(1, -1) + 2 * l(1, 0) + l(1, 1)) - (l(-1, -1) + 2 * l(-1, 0) + l(-1, 1))
          val gy = (l(-1, 1) + 2 * l(0, 1) + l(1, 1)) - (l(-1, -1) + 2 * l(0, -1) + l(1, -1))
          val mag = math.sqrt(gx * gx + gy * gy)
          if (mag > 0) {
            val bin = {
              val b = ((math.atan2(gy, gx) + math.Pi) / (2 * math.Pi) * 8).toInt
              if (b >= 8) 7 else b
            }
            edge(bin) += mag
            magSum += mag
          }
          x += 1
        }
        y += 1
      }
      val out = new Array[Float](18)
      i = 0
      while (i < 8) {
        out(i) = (hist(i) / n).toFloat
        out(8 + i) = (if (magSum > 0) edge(i) / magSum else 0.0).toFloat
        i += 1
      }
      out(16) = (mean / 255.0).toFloat
      out(17) = (rms / 255.0).toFloat
      out
    }
  }

  object ImageCodec extends ImageCodec(32) {
    /** Decode via `javax.imageio`; null for unrecognized/corrupt
      * payloads (ImageIO returns null for the former and throws for
      * the latter — both collapse to "not an image here").
      * A [[javax.imageio.stream.MemoryCacheImageInputStream]] is
      * constructed directly (NOT `ImageIO.createImageInputStream`,
      * which consults the global use-cache flag — default true — and
      * would write a temp FILE per decode on executors).
      */
    def decode(bytes: Array[Byte]): java.awt.image.BufferedImage =
      try {
        val in = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(in)
          if (!readers.hasNext) null
          else {
            val r = readers.next()
            try { r.setInput(in); r.read(0) } finally r.dispose()
          }
        } finally in.close()
      } catch { case _: Exception => null }

    /** Header-only dimension probe: the reader parses IHDR/SOF
      * markers for width/height without decoding pixel data.
      */
    def probeDims(bytes: Array[Byte]): Option[(Int, Int)] =
      try {
        val in = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(in)
          if (!readers.hasNext) None
          else {
            val r = readers.next()
            try { r.setInput(in); Some((r.getWidth(0), r.getHeight(0))) }
            finally r.dispose()
          }
        } finally in.close()
      } catch { case _: Exception => None }

    /** Bilinear resample to a `w`×`h` luminance (BT.601) grid in
      * row-major order — deterministic double arithmetic over the
      * decoded ARGB pixels.
      */
    def luminanceGrid(img: java.awt.image.BufferedImage, w: Int, h: Int): Array[Double] = {
      val out = new Array[Double](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val (r, g, b) = bilinearRgb(img, x, y, w, h)
          out(y * w + x) = 0.299 * r + 0.587 * g + 0.114 * b
          x += 1
        }
        y += 1
      }
      out
    }

    /** Bilinear resample to a `w`×`h` RGB image (same arithmetic as
      * [[luminanceGrid]], channel-wise, rounded half-up).
      */
    def resampleRgb(img: java.awt.image.BufferedImage, w: Int, h: Int): java.awt.image.BufferedImage = {
      val out = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val (r, g, b) = bilinearRgb(img, x, y, w, h)
          def ch(v: Double) = math.min(math.max((v + 0.5).toInt, 0), 255)
          out.setRGB(x, y, (ch(r) << 16) | (ch(g) << 8) | ch(b))
          x += 1
        }
        y += 1
      }
      out
    }

    private def bilinearRgb(img: java.awt.image.BufferedImage, x: Int, y: Int,
                            w: Int, h: Int): (Double, Double, Double) = {
      val sw = img.getWidth; val sh = img.getHeight
      val fx = (x + 0.5) * sw / w - 0.5
      val fy = (y + 0.5) * sh / h - 0.5
      val x0 = math.min(math.max(math.floor(fx).toInt, 0), sw - 1)
      val y0 = math.min(math.max(math.floor(fy).toInt, 0), sh - 1)
      val x1 = math.min(x0 + 1, sw - 1)
      val y1 = math.min(y0 + 1, sh - 1)
      val wx = math.min(math.max(fx - x0, 0.0), 1.0)
      val wy = math.min(math.max(fy - y0, 0.0), 1.0)
      def c(p: Int, shift: Int) = ((p >> shift) & 0xff).toDouble
      val p00 = img.getRGB(x0, y0); val p10 = img.getRGB(x1, y0)
      val p01 = img.getRGB(x0, y1); val p11 = img.getRGB(x1, y1)
      def mix(shift: Int) =
        (c(p00, shift) * (1 - wx) + c(p10, shift) * wx) * (1 - wy) +
          (c(p01, shift) * (1 - wx) + c(p11, shift) * wx) * wy
      (mix(16), mix(8), mix(0))
    }
  }

  /** REAL audio codec for WAV/PCM payloads, JDK-only
    * (`javax.sound.sampled` ships WAV/AU/AIFF parsers and PCM
    * decoding — no native libraries): decode → mono-mix → a 12-float
    * feature vector: RMS energy, zero-crossing rate, 8-band
    * log-spaced FFT spectral energy profile, duration seconds,
    * sample rate / 100kHz.
    * All arithmetic is fixed-order doubles over the decoded samples
    * — deterministic for a given payload. Undecodable payloads
    * (compressed codecs, corrupt files) featurize to an EMPTY array,
    * same contract as [[ImageCodec]]. Compressed audio (mp3/aac)
    * genuinely needs native decoders and stays out of scope.
    */
  object AudioCodec extends Codec {
    def decodeAndFeaturize(bytes: Array[Byte], meta: MediaMeta): Array[Float] = {
      val decoded = decodePcm(bytes)
      if (decoded == null) return Array.empty[Float]
      val (samples, rate) = decoded
      val n = samples.length
      if (n == 0) return Array.empty[Float]
      var sumSq = 0.0
      var zc = 0
      var i = 0
      while (i < n) {
        val s = samples(i)
        sumSq += s * s
        if (i > 0 && (s >= 0) != (samples(i - 1) >= 0)) zc += 1
        i += 1
      }
      // 8 log-spaced spectral bands from a 4096-point FFT of the
      // first samples (bounded work per payload): band b sums bin
      // energies over [2^(b+3), 2^(b+4)) — i.e. rate·8/4096 up to
      // Nyquist/2 — so a tone lands squarely in its band instead of
      // smearing into resonator sidelobes
      val mag2 = AudioCodec.fftMag2(samples, 4096)
      val bands = new Array[Double](8)
      var b = 0
      while (b < 8) {
        var k = 1 << (b + 3)
        val hi = 1 << (b + 4)
        var acc = 0.0
        while (k < hi) { acc += mag2(k); k += 1 }
        bands(b) = acc
        b += 1
      }
      val bandSum = bands.sum
      val out = new Array[Float](12)
      out(0) = math.sqrt(sumSq / n).toFloat                    // rms
      out(1) = (zc.toDouble / math.max(n - 1, 1)).toFloat      // zcr
      i = 0
      while (i < 8) {
        out(2 + i) = (if (bandSum > 0) bands(i) / bandSum else 0.0).toFloat
        i += 1
      }
      out(10) = (n.toDouble / rate).toFloat                    // seconds
      out(11) = (rate / 100000.0).toFloat
      out
    }

    /** Squared magnitudes of a radix-2 FFT over the first `size`
      * samples (zero-padded; `size` must be a power of two).
      * Iterative Cooley-Tukey in fixed evaluation order —
      * deterministic doubles.
      */
    def fftMag2(samples: Array[Double], size: Int): Array[Double] = {
      val re = new Array[Double](size)
      val im = new Array[Double](size)
      val m = math.min(samples.length, size)
      System.arraycopy(samples, 0, re, 0, m)
      // bit-reversal permutation
      var i = 1
      var j = 0
      while (i < size) {
        var bit = size >> 1
        while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
        j |= bit
        if (i < j) {
          val tr = re(i); re(i) = re(j); re(j) = tr
          val ti = im(i); im(i) = im(j); im(j) = ti
        }
        i += 1
      }
      var len = 2
      while (len <= size) {
        val ang = -2.0 * math.Pi / len
        val wr = math.cos(ang)
        val wi = math.sin(ang)
        var base = 0
        while (base < size) {
          var cr = 1.0; var ci = 0.0
          var k = 0
          while (k < len / 2) {
            val ur = re(base + k); val ui = im(base + k)
            val vr = re(base + k + len / 2) * cr - im(base + k + len / 2) * ci
            val vi = re(base + k + len / 2) * ci + im(base + k + len / 2) * cr
            re(base + k) = ur + vr; im(base + k) = ui + vi
            re(base + k + len / 2) = ur - vr; im(base + k + len / 2) = ui - vi
            val ncr = cr * wr - ci * wi
            ci = cr * wi + ci * wr; cr = ncr
            k += 1
          }
          base += len
        }
        len <<= 1
      }
      val out = new Array[Double](size)
      i = 0
      while (i < size) { out(i) = re(i) * re(i) + im(i) * im(i); i += 1 }
      out
    }

    /** Decode to mono [-1, 1] doubles + sample rate; null when the
      * payload is not a parseable PCM container.
      */
    def decodePcm(bytes: Array[Byte]): (Array[Double], Float) =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = in.getFormat
          val enc = fmt.getEncoding
          val ok = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
          if (!ok || fmt.getSampleSizeInBits % 8 != 0) null
          else {
            val raw = in.readAllBytes()
            val bytesPerSample = fmt.getSampleSizeInBits / 8
            val ch = fmt.getChannels
            val frames = raw.length / (bytesPerSample * ch)
            val outArr = new Array[Double](frames)
            val big = fmt.isBigEndian
            val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
            val full = 1L << (fmt.getSampleSizeInBits - 1)
            var f = 0
            while (f < frames) {
              var acc = 0.0
              var c = 0
              while (c < ch) {
                val off = (f * ch + c) * bytesPerSample
                var v = 0L
                var k = 0
                while (k < bytesPerSample) {
                  val byteVal = raw(off + (if (big) k else bytesPerSample - 1 - k)) & 0xffL
                  v = (v << 8) | byteVal
                  k += 1
                }
                if (signed) { // sign-extend
                  val bits = bytesPerSample * 8
                  if ((v & (1L << (bits - 1))) != 0) v -= 1L << bits
                } else v -= full // center unsigned at 0
                acc += v.toDouble / full
                c += 1
              }
              outArr(f) = acc / ch
              f += 1
            }
            (outArr, fmt.getSampleRate)
          }
        } finally in.close()
      } catch { case _: Exception => null }
  }

  /** Build a media table from any source with an id + binary column.
    * Metadata is derived cheaply (no decode) so filters on
    * format/size push down before the expensive stage.
    */
  def withMeta(df: DataFrame, idCol: String, binCol: String, format: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      col(binCol).as("media"),
      struct(
        lit(format).as("format"),
        lit(0).as("width"),
        lit(0).as("height"),
        length(col(binCol)).cast("long").as("nBytes")).as("meta"))

  /** Decode + featurize, batched per partition. `mapPartitions` keeps
    * the codec allocation per-partition (not per-row) — the Scala
    * analogue of `mapInPandas` batch shape. Partition count governs
    * parallelism; caller repartitions by payload size upstream when
    * partitions are skewed.
    */
  def extractFeatures(ds: Dataset[MediaRow], codec: Codec = StubCodec): Dataset[FeatureRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { rows =>
      // per-partition codec state would be initialized here
      rows.map { r =>
        FeatureRow(r.id, r.meta.format, codec.decodeAndFeaturize(r.media, r.meta))
      }
    }
  }

  /** Resize stage. Payloads `javax.imageio` can decode get a REAL
    * bilinear resample to `width`×`height`, re-encoded as PNG
    * (lossless — a resize stage must not add JPEG re-compression
    * noise), with true dimensions and byte count stamped into the
    * metadata. Undecodable payloads (non-image media, corrupt files)
    * fall back to the deterministic byte-budget stub so the stage
    * stays total — one corrupt file must not kill a 100 TB pass.
    * The Dataset→Dataset shape, meta propagation and per-partition
    * batching are what downstream stages rely on.
    */
  def resize(ds: Dataset[MediaRow], width: Int, height: Int): Dataset[MediaRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val budget = math.max(width * height / 8, 1)
    ds.mapPartitions { rows =>
      rows.map { r =>
        val img = ImageCodec.decode(r.media)
        if (img != null) {
          val scaled = ImageCodec.resampleRgb(img, width, height)
          val baos = new java.io.ByteArrayOutputStream()
          // Memory-cache output stream for the same reason as decode():
          // ImageIO.write(img, fmt, OutputStream) would otherwise spill
          // a temp FILE per encoded image on executors.
          val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
          try javax.imageio.ImageIO.write(scaled, "png", ios) finally ios.close()
          val bytes = baos.toByteArray
          MediaRow(r.id, bytes, MediaMeta("png", width, height, bytes.length.toLong))
        } else {
          val bytes =
            if (r.media.length <= budget) r.media
            else java.util.Arrays.copyOfRange(r.media, 0, budget)
          MediaRow(r.id, bytes,
            MediaMeta(r.meta.format, width, height, bytes.length.toLong))
        }
      }
    }
  }

  /** [[withMeta]] variant that probes REAL image dimensions from the
    * payload headers (no pixel decode — the reader parses IHDR/SOF
    * only, so this is cheap enough to run before partition-sizing
    * filters). Non-image payloads keep width = height = 0.
    */
  def withImageMeta(df: DataFrame, idCol: String, binCol: String, format: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol).cast("long").as("id"), col(binCol).as("media"))
      .as[(Long, Array[Byte])]
    base.mapPartitions { rows =>
      rows.map { case (id, bytes) =>
        val (w, h) = ImageCodec.probeDims(bytes).getOrElse((0, 0))
        MediaRow(id, bytes, MediaMeta(format, w, h, bytes.length.toLong))
      }
    }.toDF()
  }

  /** REAL frame sampling for demuxable containers: RIFF/AVI payloads
    * (MJPEG — each frame a complete JPEG that [[ImageCodec]] decodes)
    * are parsed with the JDK-only [[Avi]] demuxer and `n` evenly-
    * spaced REAL frames are emitted with their source frame indices.
    * Non-demuxable payloads fall back to [[sampleFrames]]' byte
    * slicer so the stage stays total. Inter-frame compressed codecs
    * (H.264 …) genuinely need native decoders — out of scope.
    */
  def sampleVideoFrames(ds: Dataset[MediaRow], n: Int): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.flatMap { r =>
      val fr = Avi.frames(r.media)
      if (fr.nonEmpty) {
        val k = math.max(math.min(n, fr.size), 1)
        (0 until k).iterator.map { i =>
          val idx = (i.toLong * fr.size / k).toInt // evenly spaced
          (r.id, idx, fr(idx))
        }
      } else sliceFrames(r, n)
    }.toDF("id", "frame_idx", "frame_bytes")
  }

  private def sliceFrames(r: MediaRow, n: Int): Iterator[(Long, Int, Array[Byte])] = {
    val sz = math.max(r.media.length / math.max(n, 1), 1)
    (0 until n).iterator.map { i =>
      val from = math.min(i * sz, math.max(r.media.length - 1, 0))
      val until = math.min(from + sz, r.media.length)
      (r.id, i, java.util.Arrays.copyOfRange(r.media, from, until))
    }
  }

  /** Frame-sampling stub for video payloads: emits `n` byte-slices
    * per payload with frame indices — [[sampleVideoFrames]] is the
    * real path for demuxable containers; this keeps a deterministic
    * shape for payloads whose codec is out of scope.
    */
  def sampleFrames(ds: Dataset[MediaRow], n: Int): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.flatMap { r =>
      val sz = math.max(r.media.length / math.max(n, 1), 1)
      (0 until n).iterator.map { i =>
        val from = math.min(i * sz, math.max(r.media.length - 1, 0))
        val until = math.min(from + sz, r.media.length)
        (r.id, i, java.util.Arrays.copyOfRange(r.media, from, until))
      }
    }.toDF("id", "frame_idx", "frame_bytes")
  }
}
