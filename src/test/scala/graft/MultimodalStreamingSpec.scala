package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

import graft.multimodal.{Avi, Multimodal}
import graft.multimodal.Multimodal.{MediaMeta, MediaRow}
import graft.streaming.StreamingDQ
import graft.quality.Rule

class MultimodalStreamingSpec extends SparkSpec {

  test("multimodal: withMeta derives size metadata without decoding") {
    import spark.implicits._
    val df = Seq((1L, Array[Byte](1, 2, 3)), (2L, Array[Byte](9))).toDF("id", "payload")
    val m = Multimodal.withMeta(df, "id", "payload", "png").collect()
      .map(r => r.getLong(0) -> r.getStruct(2).getAs[Long]("nBytes")).toMap
    assert(m == Map(1L -> 3L, 2L -> 1L))
  }

  test("multimodal: stub feature extraction is deterministic and batch-shaped") {
    import spark.implicits._
    val rows = Seq(
      MediaRow(1L, Array[Byte](1, 2, 3, 4), MediaMeta("png", 0, 0, 4)),
      MediaRow(2L, Array[Byte](1, 2, 3, 4), MediaMeta("png", 0, 0, 4)),
      MediaRow(3L, Array[Byte](9, 9), MediaMeta("png", 0, 0, 2)))
    val ds = spark.createDataset(rows)
    val out = Multimodal.extractFeatures(ds).collect().sortBy(_.id)
    assert(out.length == 3 && out.forall(_.features.length == 8))
    assert(out(0).features.sameElements(out(1).features)) // same bytes => same features
    assert(!out(0).features.sameElements(out(2).features))
  }

  test("multimodal: resize stamps target geometry and bounds payload size") {
    import spark.implicits._
    val ds = spark.createDataset(Seq(
      MediaRow(1L, Array.tabulate[Byte](500)(_.toByte), MediaMeta("png", 0, 0, 500)),
      MediaRow(2L, Array[Byte](1, 2), MediaMeta("png", 0, 0, 2))))
    val out = Multimodal.resize(ds, 32, 32).collect().sortBy(_.id).toSeq
    assert(out.forall(r => r.meta.width == 32 && r.meta.height == 32))
    assert(out(0).media.length == 32 * 32 / 8) // truncated to the budget
    assert(out(1).media.length == 2)           // small payloads pass through
    assert(out.forall(r => r.meta.nBytes == r.media.length))
  }

  // real PNG/JPEG fixture bytes, generated in-test (no files): a
  // deterministic two-tone gradient so edge bins are non-trivial
  private def fixtureImage(w: Int, h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = if (x < w / 2) (255 * y) / math.max(h - 1, 1) else 32
      img.setRGB(x, y, (v << 16) | ((255 - v) << 8) | (x * 255 / math.max(w - 1, 1)))
    }
    img
  }
  private def encode(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, baos)
    baos.toByteArray
  }

  test("multimodal: ImageCodec decodes real PNG and JPEG bytes end-to-end") {
    import spark.implicits._
    val png = encode(fixtureImage(40, 24), "png")
    val jpg = encode(fixtureImage(40, 24), "jpg")
    assert(png.nonEmpty && jpg.nonEmpty)
    val rows = Seq(
      MediaRow(1L, png, MediaMeta("png", 0, 0, png.length.toLong)),
      MediaRow(2L, jpg, MediaMeta("jpg", 0, 0, jpg.length.toLong)),
      MediaRow(3L, Array[Byte](1, 2, 3), MediaMeta("png", 0, 0, 3))) // corrupt
    val ds = spark.createDataset(rows)
    val out = Multimodal.extractFeatures(ds, Multimodal.ImageCodec).collect().sortBy(_.id)
    // real decode: 18 features, histograms normalized, corrupt -> empty
    assert(out(0).features.length == 18 && out(1).features.length == 18)
    assert(out(2).features.isEmpty)
    assert(out(0).features.forall(f => f >= 0f && f <= 1f))
    assert(math.abs(out(0).features.take(8).sum - 1f) < 1e-5) // lum hist sums to 1
    // PNG is lossless: features must match a direct local featurize
    val local = Multimodal.ImageCodec.decodeAndFeaturize(png,
      MediaMeta("png", 0, 0, png.length.toLong))
    assert(out(0).features.sameElements(local))
    // PNG and JPEG of the SAME image decode to near-identical features
    // (JPEG is lossy, so approximate agreement, not bit-equality)
    out(0).features.zip(out(1).features).foreach { case (a, b) =>
      assert(math.abs(a - b) < 0.08, s"png=$a jpg=$b")
    }
    // different images -> different features
    val other = Multimodal.ImageCodec.decodeAndFeaturize(
      encode(fixtureImage(13, 57), "png"), MediaMeta("png", 0, 0, 0L))
    assert(!local.sameElements(other))
  }

  test("multimodal: resize really rescales decodable images (and stamps true meta)") {
    import spark.implicits._
    val png = encode(fixtureImage(64, 48), "png")
    val ds = spark.createDataset(Seq(
      MediaRow(1L, png, MediaMeta("png", 64, 48, png.length.toLong))))
    val out = Multimodal.resize(ds, 16, 12).collect()(0)
    assert(out.meta.width == 16 && out.meta.height == 12)
    assert(out.meta.nBytes == out.media.length)
    // the payload is a real PNG of the target geometry
    val back = Multimodal.ImageCodec.decode(out.media)
    assert(back != null && back.getWidth == 16 && back.getHeight == 12)
    // lossless round trip: resampling the original locally gives the
    // exact same pixels as decoding the resized payload
    val expect = Multimodal.ImageCodec.resampleRgb(
      Multimodal.ImageCodec.decode(png), 16, 12)
    for (y <- 0 until 12; x <- 0 until 16)
      assert((back.getRGB(x, y) & 0xffffff) == (expect.getRGB(x, y) & 0xffffff))
  }

  test("multimodal: withImageMeta probes real dimensions from headers") {
    import spark.implicits._
    val png = encode(fixtureImage(31, 17), "png")
    val df = Seq((1L, png), (2L, Array[Byte](0, 1, 2))).toDF("id", "payload")
    val m = Multimodal.withImageMeta(df, "id", "payload", "png").collect()
      .map(r => r.getLong(0) -> {
        val s = r.getStruct(2); (s.getAs[Int]("width"), s.getAs[Int]("height"))
      }).toMap
    assert(m(1L) == ((31, 17)))
    assert(m(2L) == ((0, 0))) // non-image: dims stay 0
  }

  // real WAV/PCM fixture: 16-bit little-endian sine wave, built via
  // javax.sound.sampled (the same stack the codec decodes with)
  private def wavBytes(freq: Double, rate: Float, secs: Double, amp: Double,
                       channels: Int = 1): Array[Byte] = {
    val n = (rate * secs).toInt
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, channels, true, false)
    val data = new Array[Byte](n * 2 * channels)
    for (i <- 0 until n; c <- 0 until channels) {
      val v = (math.sin(2 * math.Pi * freq * i / rate) * amp * 32767).toInt.toShort
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

  test("multimodal: AudioCodec decodes real WAV bytes end-to-end") {
    import spark.implicits._
    val mono = wavBytes(440.0, 8000f, 0.5, 0.5)
    val stereo = wavBytes(440.0, 8000f, 0.5, 0.5, channels = 2)
    val rows = Seq(
      MediaRow(1L, mono, MediaMeta("wav", 0, 0, mono.length.toLong)),
      MediaRow(2L, stereo, MediaMeta("wav", 0, 0, stereo.length.toLong)),
      MediaRow(3L, Array[Byte](1, 2, 3, 4), MediaMeta("wav", 0, 0, 4L)))
    val out = Multimodal.extractFeatures(spark.createDataset(rows),
      Multimodal.AudioCodec).collect().sortBy(_.id)
    assert(out(0).features.length == 12)
    assert(out(2).features.isEmpty, "corrupt payload -> empty features")
    val f = out(0).features
    // amp-0.5 sine: rms = 0.5/sqrt(2) ~ 0.354; 440 Hz at 8 kHz: zcr ~ 0.11
    assert(math.abs(f(0) - 0.354f) < 0.02, s"rms=${f(0)}")
    assert(math.abs(f(1) - 0.11f) < 0.015, s"zcr=${f(1)}")
    // spectral profile: 440 Hz at 8 kHz -> FFT bin 225 -> band
    // [128,256) = index 4 dominates; profile sums to 1
    assert(math.abs(f.slice(2, 10).sum - 1f) < 1e-4)
    val bandsF = f.slice(2, 10)
    assert(bandsF.indexOf(bandsF.max) == 4, bandsF.mkString(","))
    assert(bandsF(4) > 0.8f, "tone energy concentrated in its band")
    // a different tone lands in a different band (1500 Hz -> bin 768
    // -> band [512,1024) = index 6)
    val hi = Multimodal.AudioCodec.decodeAndFeaturize(
      wavBytes(1500.0, 8000f, 0.5, 0.5), MediaMeta("wav", 0, 0, 0L)).slice(2, 10)
    assert(hi.indexOf(hi.max) == 6, hi.mkString(","))
    assert(math.abs(f(10) - 0.5f) < 1e-3, s"duration=${f(10)}")
    assert(math.abs(f(11) - 0.08f) < 1e-6, s"rate=${f(11)}")
    // stereo mixes to the same mono content -> near-identical features
    out(0).features.zip(out(1).features).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-3, s"mono=$a stereo=$b")
    }
    // determinism
    val again = Multimodal.AudioCodec.decodeAndFeaturize(mono,
      MediaMeta("wav", 0, 0, mono.length.toLong))
    assert(again.sameElements(f))
  }

  // minimal MJPEG AVI built by hand: RIFF(AVI ) -> LIST(movi) ->
  // '00dc' chunks, each a complete JPEG
  private def mjpegAvi(frames: Seq[Array[Byte]]): Array[Byte] = {
    def le32(v: Int) = Array[Byte](
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def ascii(s: String) = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    def chunk(id: String, data: Array[Byte]) =
      ascii(id) ++ le32(data.length) ++ data ++
        (if (data.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    val movi = ascii("movi") ++ frames.flatMap(f => chunk("00dc", f))
    val lst = chunk("LIST", movi)
    ascii("RIFF") ++ le32(4 + lst.length) ++ ascii("AVI ") ++ lst
  }

  test("multimodal: real MJPEG AVI demux — evenly sampled frames decode as images") {
    import spark.implicits._
    // 6 frames with distinct content (varying geometry pattern)
    val jpegs = (0 until 6).map(i => encode(fixtureImage(24 + i, 16), "jpg"))
    val avi = mjpegAvi(jpegs)
    assert(Avi.frames(avi).size == 6)
    val rows = Seq(
      MediaRow(1L, avi, MediaMeta("avi", 0, 0, avi.length.toLong)),
      MediaRow(2L, Array.tabulate[Byte](20)(_.toByte), MediaMeta("mp4", 0, 0, 20L)))
    val out = Multimodal.sampleVideoFrames(spark.createDataset(rows), 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2)))
    val vid = out.filter(_._1 == 1L).sortBy(_._2)
    assert(vid.map(_._2).toSeq == Seq(0, 2, 4), "evenly spaced source frame indices")
    // each sampled frame is the EXACT source JPEG and decodes with real dims
    vid.foreach { case (_, idx, bytes) =>
      assert(bytes.sameElements(jpegs(idx)))
      val img = Multimodal.ImageCodec.decode(bytes)
      assert(img != null && img.getWidth == 24 + idx && img.getHeight == 16)
    }
    // non-demuxable payload falls back to the byte slicer (3 slices)
    assert(out.count(_._1 == 2L) == 3)
    // corrupt/truncated container -> no frames, no throw
    assert(Avi.frames(avi.take(30)).isEmpty ||
      Avi.frames(avi.take(30)).size < 6)
    assert(Avi.frames(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("multimodal: adversarial AVI terminates (overflow sizes, LIST bombs)") {
    def le32(v: Long) = Array[Byte](
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def ascii(s: String) = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    // chunk size 0xFFFFFFF8: size.toInt = -8, a naive Int advance steps
    // exactly 0 and spins forever — must return (empty) instead
    val spin = ascii("RIFF") ++ le32(200) ++ ascii("AVI ") ++
      ascii("00dc") ++ le32(0xFFFFFFF8L) ++ Array.fill[Byte](64)(0)
    assert(Avi.frames(spin).isEmpty)
    // size 0xFFFFFFF7 (odd): pad bit makes the naive advance 0 too
    val spin2 = ascii("RIFF") ++ le32(200) ++ ascii("AVI ") ++
      ascii("00dc") ++ le32(0xFFFFFFF7L) ++ Array.fill[Byte](64)(0)
    assert(Avi.frames(spin2).isEmpty)
    // deeply nested LIST-of-LIST (size covering rest of file each level):
    // must not StackOverflowError; bounded depth returns cleanly
    val depth = 10000
    // a complete LIST(movi) holding one 2-byte frame chunk
    val moviList = ascii("LIST") ++ le32(14) ++ ascii("movi") ++
      ascii("00dc") ++ le32(2) ++ Array[Byte](1, 2)
    val nested = (1 to depth).foldLeft(moviList) { (acc, _) =>
      ascii("LIST") ++ le32(acc.length + 4L) ++ ascii("rec ") ++ acc
    }
    val bomb = ascii("RIFF") ++ le32(nested.length + 4L) ++ ascii("AVI ") ++ nested
    val res = Avi.frames(bomb) // must terminate without throwing
    assert(res.isEmpty, "frames below MaxDepth-nested LISTs are skipped, not crashed on")
    // sanity: modest legal nesting still demuxes
    val shallow = (1 to 3).foldLeft(moviList) { (acc, _) =>
      ascii("LIST") ++ le32(acc.length + 4L) ++ ascii("rec ") ++ acc
    }
    val ok = ascii("RIFF") ++ le32(shallow.length + 4L) ++ ascii("AVI ") ++ shallow
    assert(Avi.frames(ok).size == 1)
  }

  test("multimodal: frame sampling emits n slices per payload") {
    import spark.implicits._
    val ds = spark.createDataset(Seq(
      MediaRow(1L, Array.tabulate[Byte](20)(_.toByte), MediaMeta("mp4", 0, 0, 20))))
    val frames = Multimodal.sampleFrames(ds, 4).collect()
    assert(frames.length == 4)
    assert(frames.map(_.getInt(1)).toSet == Set(0, 1, 2, 3))
  }

  test("streaming: windowed DQ score over a memory stream with watermark") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Option[Double])]
    val stream = mem.toDF().toDF("ts", "value")
    val scored = StreamingDQ.windowedDqScore(stream, "ts", "value",
      Seq(Rule.NumBetween(0, 100)), "1 minute", "2 minutes")
    val q = scored.writeStream.format("memory").queryName("dq_out")
      .outputMode(OutputMode.Append()).start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      mem.addData(
        (t("2026-01-01 00:00:10"), Some(50.0)),
        (t("2026-01-01 00:00:20"), Some(500.0)), // out of format
        (t("2026-01-01 00:00:30"), None))        // null
      q.processAllAvailable()
      // advance event time past watermark so the first window closes
      mem.addData((t("2026-01-01 00:10:00"), Some(1.0)))
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM dq_out").collect()
      assert(rows.length == 1)
      val r = rows(0)
      assert(r.getAs[Long]("total") == 3 && r.getAs[Long]("null_records") == 1 &&
        r.getAs[Long]("out_of_format_records") == 1)
      assert(math.abs(r.getAs[Double]("dq_score") - 33.33) < 0.01)
    } finally q.stop()
  }

  test("streaming: multi-column windowed DQ summary emits one row per (window, column)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Option[Double], String)]
    val stream = mem.toDF().toDF("ts", "value", "kind")
    val summed = StreamingDQ.windowedDqSummary(stream, "ts", Seq(
      "value" -> Seq(Rule.NumBetween(0, 100)),
      "kind" -> Seq(Rule.LenBetween(2, 4))), "1 minute", "2 minutes")
    val q = summed.writeStream.format("memory").queryName("dqsum_out")
      .outputMode(OutputMode.Append()).start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      mem.addData(
        (t("2026-01-01 00:00:10"), Some(50.0), "ok"),
        (t("2026-01-01 00:00:20"), Some(500.0), "toolong"), // value OOF, kind OOF
        (t("2026-01-01 00:00:30"), None, "ok"))             // value null
      q.processAllAvailable()
      mem.addData((t("2026-01-01 00:10:00"), Some(1.0), "ok")) // close window 1
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM dqsum_out").collect()
        .map(r => r.getAs[String]("column") ->
          ((r.getAs[Long]("total"), r.getAs[Long]("null_records"),
            r.getAs[Long]("out_of_format_records")))).toMap
      assert(rows.size == 2, "one row per column for the closed window")
      assert(rows("value") == ((3L, 1L, 1L)))
      assert(rows("kind") == ((3L, 0L, 1L)))
    } finally q.stop()
  }

  test("streaming: dedup within watermark drops repeated keys") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val stream = mem.toDF().toDF("ts", "k")
    val deduped = StreamingDQ.streamingDedup(stream, "ts", Seq("k"), "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      mem.addData((t("2026-01-01 00:00:01"), "a"), (t("2026-01-01 00:00:02"), "a"),
        (t("2026-01-01 00:00:03"), "b"))
      q.processAllAvailable()
      val keys = spark.sql("SELECT k FROM dedup_out").collect().map(_.getString(0)).toSeq
      assert(keys.sorted == Seq("a", "b"))
    } finally q.stop()
  }

  test("streaming: sessionization merges within-gap events, watermark closes sessions") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val stream = mem.toDF().toDF("ts", "k")
    val sessions = StreamingDQ.sessionCounts(stream, "ts", "k", "10 minutes",
      watermark = Some("10 minutes"))
    val q = sessions.writeStream.format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Append()).start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      mem.addData(
        (t("2026-01-01 00:00:00"), "a"), (t("2026-01-01 00:05:00"), "a"), // one session
        (t("2026-01-01 00:30:00"), "a"),                                  // gap > 10m -> new
        (t("2026-01-01 00:31:00"), "b"))
      q.processAllAvailable()
      mem.addData((t("2026-01-01 03:00:00"), "z")) // advance watermark, close all
      q.processAllAvailable()
      val got = spark.sql("SELECT k, cnt FROM sessions_out WHERE k IN ('a','b')")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
      assert(got == Seq(("a", 1L), ("a", 2L), ("b", 1L)), s"got $got")
    } finally q.stop()
  }

  test("streaming: running per-key DQ state accumulates ACROSS micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, Option[Double])]
    val stream = mem.toDF().toDF("k", "value")
    val running = StreamingDQ.runningDqByKey(stream, "k", "value",
      Seq(Rule.NumBetween(0, 100)), alertRatio = 0.5)
    val q = running.toDF().writeStream.format("memory").queryName("running_out")
      .outputMode(OutputMode.Update()).start()
    try {
      // batch 1: key a -> 2 good; key b -> 1 good 1 bad
      mem.addData(("a", Some(1.0)), ("a", Some(2.0)), ("b", Some(3.0)), ("b", Some(999.0)))
      q.processAllAvailable()
      // batch 2: key a -> 1 bad (cumulative a: 1/3); b untouched
      mem.addData(("a", None))
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM running_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(4)))
      // batch-1 emissions
      assert(rows.contains(("a", 2L, 0L, false)))
      assert(rows.contains(("b", 2L, 1L, true))) // ratio 0.5 crosses threshold
      // batch-2 emission proves state carried over: total 3 includes batch 1
      assert(rows.contains(("a", 3L, 1L, false)))
      assert(!rows.map(_._1).sliding(1).isEmpty)
      assert(rows.count(_._1 == "b") == 1, "untouched key must not re-emit")
    } finally q.stop()
  }

  test("streaming: PROCESSING-TIME idleTimeout evicts an idle key under a periodic trigger") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, Option[Double])]
    val stream = mem.toDF().toDF("k", "value")
    // wall-clock variant: with a registered ProcessingTimeTimeout the
    // engine constructs micro-batches continuously (each trigger must
    // re-evaluate timeouts), so this test drives a real periodic
    // trigger and POLLS — processAllAvailable() would not converge
    val running = StreamingDQ.runningDqByKey(stream, "k", "value",
      Seq(Rule.NumBetween(0, 100)), alertRatio = 0.5,
      idleTimeout = Some("500 milliseconds"))
    val q = running.toDF().writeStream.format("memory").queryName("pt_evict_out")
      .outputMode(OutputMode.Update())
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      .start()
    try {
      def rows() = spark.sql("SELECT key, total FROM pt_evict_out").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      def poll(desc: String)(pred: => Boolean): Unit = {
        val end = System.currentTimeMillis + 60000
        while (!pred && System.currentTimeMillis < end) Thread.sleep(50)
        assert(pred, s"timed out waiting for $desc; sink=${rows().mkString(",")}")
      }
      mem.addData(("a", Some(1.0)))
      poll("first emission")(rows().contains(("a", 1L)))
      // no new data: the idle clock runs. Wait for the ENGINE to
      // report zero state rows — deterministic proof of eviction,
      // not a sleep guess (eviction emits nothing observable)
      poll("state eviction") {
        val p = q.lastProgress
        p != null && p.stateOperators.nonEmpty &&
          p.stateOperators.head.numRowsTotal == 0
      }
      // the key returns: counters must restart from zero (total=1
      // again), never total=2
      mem.addData(("a", Some(2.0)))
      poll("restarted emission")(rows().count(_ == (("a", 1L))) == 2)
      assert(!rows().contains(("a", 2L)),
        s"evicted key must restart from zero, got ${rows().mkString(",")}")
    } finally q.stop()
  }

  test("streaming: event-time idle eviction drops a stale key's running counters end-to-end") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Option[Double])]
    val stream = mem.toDF().toDF("ts", "k", "value")
    // idle gap 60 s of EVENT time; watermark == max event time seen
    val running = StreamingDQ.runningDqByKeyEventTime(stream, "ts", "k", "value",
      Seq(Rule.NumBetween(0, 100)), alertRatio = 0.5, idleGapMs = 60000L)
    val q = running.toDF().writeStream.format("memory").queryName("evict_out")
      .outputMode(OutputMode.Update()).start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      // batch 1: both keys live (timeouts armed at t+60s)
      mem.addData((t("2026-01-01 00:00:00"), "a", Some(1.0)),
        (t("2026-01-01 00:00:00"), "b", Some(2.0)))
      q.processAllAvailable()
      // batch 2: only `a` advances event time to 00:10 — past b's
      // timeout, but eviction fires in the NEXT batch (this batch
      // still ran with the previous watermark)
      mem.addData((t("2026-01-01 00:10:00"), "a", Some(3.0)))
      q.processAllAvailable()
      // batch 3: watermark is now 00:10 > b's 00:01 timeout => b evicted
      mem.addData((t("2026-01-01 00:11:00"), "a", Some(4.0)))
      q.processAllAvailable()
      // batch 4: b returns — counters must restart from zero
      mem.addData((t("2026-01-01 00:12:00"), "b", Some(5.0)))
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM evict_out").collect()
        .map(r => (r.getString(0), r.getLong(1)))
      // a accumulated across every batch it appeared in
      assert(rows.contains(("a", 1L)) && rows.contains(("a", 2L)) && rows.contains(("a", 3L)))
      // b emitted total=1 twice: once before eviction, once after its
      // restart — never total=2, proving the state was dropped
      assert(rows.count(_ == ("b", 1L)) == 2, s"want b restarted from zero, got ${rows.mkString(",")}")
      assert(!rows.contains(("b", 2L)))
    } finally q.stop()
  }

  test("streaming: windowed per-type counts") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val stream = mem.toDF().toDF("ts", "event_type")
    val counts = StreamingDQ.windowedTypeCounts(stream, "ts", "event_type", "1 minute", "1 minute")
    val q = counts.writeStream.format("memory").queryName("types_out")
      .outputMode(OutputMode.Append()).start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      mem.addData((t("2026-01-01 00:00:01"), "click"), (t("2026-01-01 00:00:02"), "click"),
        (t("2026-01-01 00:00:03"), "view"))
      q.processAllAvailable()
      mem.addData((t("2026-01-01 00:05:00"), "late")) // close the window
      q.processAllAvailable()
      val m = spark.sql("SELECT event_type, cnt FROM types_out").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(m == Map("click" -> 2L, "view" -> 1L))
    } finally q.stop()
  }

  test("replayClosedWindows: closed-window union == batch result for any batch split") {
    // the q_s5/q_s6 gate harness, property-style: a seeded random
    // event table replayed as a real file-source stream must produce
    // EXACTLY the batch windowed aggregation, whatever the arrival
    // split — 1 batch (degenerate), 2, and 5 (more files than
    // distinct windows exercises empty arrival slices too)
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val types = Seq("click", "view", "buy")
    val rows = (0 until 400).map { i =>
      (new Timestamp(1767225600000L + rnd.nextInt(7200) * 1000L),
        types(rnd.nextInt(types.size)))
    }
    val df = rows.toDF("ts", "event_type")
    val want = StreamingDQ.windowedTypeCounts(df, "ts", "event_type",
        "10 minutes", "5 minutes")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    for (n <- Seq(1, 2, 5)) {
      val got = StreamingDQ.replayClosedWindows(df, "ts",
        s"/tmp/graft_test/replay_prop_$n", n, 3600L * 1000000L) { st =>
        StreamingDQ.windowedTypeCounts(st, "ts", "event_type",
          "10 minutes", "5 minutes")
      }.collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(got == want, s"nBatches=$n: closed-window union != batch result")
    }
  }

  test("replayClosedWindows: an EMPTY time slice still gets its arrival file") {
    // r16 (the one-pass arrival writer): a slice whose time range
    // holds no rows must still produce a schema-only arrival file —
    // the batch COUNT drives watermark advancement, so it has to be
    // slice-list-shaped, never data-shaped. Data clustered at the two
    // ends of the span leaves the middle third genuinely empty.
    import spark.implicits._
    val rows = (0 until 60).map { i =>
      val sec = if (i % 2 == 0) i else 7200 - i
      (new Timestamp(1767225600000L + sec * 1000L), if (i % 3 == 0) "click" else "view")
    }
    val df = rows.toDF("ts", "event_type")
    val dir = "/tmp/graft_test/replay_empty_slice"
    val want = StreamingDQ.windowedTypeCounts(df, "ts", "event_type",
        "10 minutes", "5 minutes")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val got = StreamingDQ.replayClosedWindows(df, "ts", dir, 3,
      3600L * 1000000L) { st =>
      StreamingDQ.windowedTypeCounts(st, "ts", "event_type",
        "10 minutes", "5 minutes")
    }.collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want, "closed-window union != batch result with an empty slice")
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(files.length == 4, s"expected 3 slices + sentinel, got ${files.length}")
    // the middle slice is the empty one: its file must read as zero
    // rows under the stream schema
    val mid = spark.read.schema(df.schema).parquet(files(1).getPath)
    assert(mid.count() == 0, "middle slice should be empty")
  }

  test("replayClosedWindowsLate: below-watermark arrivals are DROPPED end-to-end") {
    // r13 (q_s10 harness): late rows re-deliver EXISTING event times
    // with different payloads AFTER the sentinel has advanced the
    // watermark — the closed-window union must equal the batch
    // computation over the on-time rows ALONE, proving both the drop
    // and on-time invariance. The late rows would visibly change
    // counts if leaked (they double several windows' rows).
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val types = Seq("click", "view", "buy")
    val rows = (0 until 300).map { i =>
      (new Timestamp(1767225600000L + rnd.nextInt(7200) * 1000L),
        types(rnd.nextInt(types.size)))
    }
    val df = rows.toDF("ts", "event_type")
    val late = df.filter(col("event_type") === "click")
      .withColumn("event_type", lit("LATE"))
    val want = StreamingDQ.windowedTypeCounts(df, "ts", "event_type",
        "10 minutes", "5 minutes")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val got = StreamingDQ.replayClosedWindowsLate(df, late, "ts",
      "/tmp/graft_test/replay_late", 2, 3600L * 1000000L) { st =>
      StreamingDQ.windowedTypeCounts(st, "ts", "event_type",
        "10 minutes", "5 minutes")
    }.collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want, "late rows leaked into the closed-window union")
    assert(!got.exists(_._2 == "LATE"), "a LATE row appeared in the result")
  }

  test("replayClosedWindowsLate: a not-actually-late lateDf fails loud") {
    import spark.implicits._
    val df = Seq((new Timestamp(1767225600000L), "a")).toDF("ts", "event_type")
    val late = Seq((new Timestamp(1767225700000L), "b")).toDF("ts", "event_type")
    val ex = intercept[IllegalArgumentException] {
      StreamingDQ.replayClosedWindowsLate(df, late, "ts",
        "/tmp/graft_test/replay_late_bad", 1, 1000000L) { st =>
        StreamingDQ.windowedTypeCounts(st, "ts", "event_type")
      }
    }
    assert(ex.getMessage.contains("max on-time ts"))
  }

  test("streamingDedupAgainstStore drops store hits and in-stream re-deliveries") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val store = graft.dedup.Dedup.fingerprints(
      Seq((100L, "already ingested doc")).toDF("doc_id", "text"), "text")
    val mem = MemoryStream[(Timestamp, Long, String)]
    val stream = mem.toDF().toDF("ts", "doc_id", "text")
    val out = StreamingDQ.streamingDedupAgainstStore(
      stream, "text", "ts", store, "fingerprint")
    val q = out.writeStream.format("memory").queryName("ingest_out")
      .outputMode(OutputMode.Append()).start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      mem.addData(
        (t("2026-01-01 00:00:10"), 1L, "already ingested doc"), // in store -> drop
        (t("2026-01-01 00:00:20"), 2L, "fresh doc a"),          // keep
        (t("2026-01-01 00:00:30"), 3L, "fresh doc a"),          // in-stream dup -> drop
        (t("2026-01-01 00:00:40"), 4L, "fresh doc b"))          // keep
      q.processAllAvailable()
      val kept = spark.sql("SELECT doc_id FROM ingest_out").collect()
        .map(_.getLong(0)).toSet
      assert(kept == Set(2L, 4L), s"kept $kept")
    } finally q.stop()
  }

  test("streamIntervalJoin correlates point events to open intervals per key") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long, String)]
    val imps = MemoryStream[(Timestamp, Long, String)]
    val out = StreamingDQ.streamIntervalJoin(
      clicks.toDF().toDF("c_ts", "c_user", "c_id"), "c_ts", "c_user",
      imps.toDF().toDF("i_ts", "i_user", "i_id"), "i_ts", "i_user",
      span = "30 MINUTES", watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("ssjoin_out")
      .outputMode(OutputMode.Append()).start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      imps.addData(
        (t("2026-01-01 00:00:00"), 7L, "imp1"),
        (t("2026-01-01 01:00:00"), 7L, "imp2"),
        (t("2026-01-01 00:00:00"), 8L, "imp3"))
      clicks.addData(
        (t("2026-01-01 00:10:00"), 7L, "click_in"),     // within imp1's 30 min
        (t("2026-01-01 00:45:00"), 7L, "click_gap"),    // between imp1 and imp2
        (t("2026-01-01 01:05:00"), 7L, "click_in2"),    // within imp2
        (t("2026-01-01 00:10:00"), 9L, "click_nokey"))  // no impression for user 9
      q.processAllAvailable()
      val got = spark.sql("SELECT c_id, i_id FROM ssjoin_out").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(got == Set(("click_in", "imp1"), ("click_in2", "imp2")), s"got $got")
    } finally q.stop()
  }

  test("streamIntervalJoin rejects colliding column names") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val a = MemoryStream[(Timestamp, Long)].toDF().toDF("ts", "k")
    val b = MemoryStream[(Timestamp, Long)].toDF().toDF("ts", "k")
    val e = intercept[IllegalArgumentException] {
      StreamingDQ.streamIntervalJoin(a, "ts", "k", b, "ts", "k",
        "5 MINUTES", "1 minute")
    }
    assert(e.getMessage.contains("collision"))
  }

  test("windowedFrequentItems: sketch agg runs inside a streaming window") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val out = StreamingDQ.windowedFrequentItems(
      mem.toDF().toDF("ts", "item"), "ts", "item",
      windowDur = "1 minute", watermark = "2 minutes", maxMapSize = 16)
    val q = out.writeStream.format("memory").queryName("wfreq_out")
      .outputMode(OutputMode.Append()).start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      mem.addData(
        (t("2026-01-01 00:00:01"), "a"), (t("2026-01-01 00:00:02"), "a"),
        (t("2026-01-01 00:00:03"), "a"), (t("2026-01-01 00:00:04"), "b"))
      q.processAllAvailable()
      mem.addData((t("2026-01-01 00:10:00"), "zz")) // close window 1
      q.processAllAvailable()
      val rows = spark.sql("SELECT item, est, lb, ub FROM wfreq_out").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      assert(rows == Map("a" -> ((3L, 3L, 3L)), "b" -> ((1L, 1L, 1L))))
    } finally q.stop()
  }

  test("windowedDistinct: HLL agg maintains per-window state; exact in sparse regime") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val out = StreamingDQ.windowedDistinct(
      mem.toDF().toDF("ts", "item"), "ts", "item",
      windowDur = "1 minute", watermark = "2 minutes")
    val q = out.writeStream.format("memory").queryName("wdist_out")
      .outputMode(OutputMode.Append()).start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      // window 1: {a,b,c} across TWO micro-batches (state must merge)
      mem.addData((t("2026-01-01 00:00:01"), "a"), (t("2026-01-01 00:00:02"), "b"))
      q.processAllAvailable()
      mem.addData((t("2026-01-01 00:00:03"), "a"), (t("2026-01-01 00:00:04"), "c"))
      q.processAllAvailable()
      mem.addData((t("2026-01-01 00:10:00"), "zz")) // close window 1
      q.processAllAvailable()
      val rows = spark.sql("SELECT window_start, distinct_est FROM wdist_out")
        .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1)))
      assert(rows.toSeq == Seq(("2026-01-01 00:00:00.0", 3L)))
    } finally q.stop()
  }

  // Closes the loop the r10 regression exposed: the batch oracle for
  // D14 used to read ts through a hard-coded physical representation
  // while the streaming specs fed synthetic TimestampType columns —
  // nothing ever STREAMED the real events parquet. This test runs
  // windowedDqSummary as an actual file-source stream over the
  // driver-shipped events table (whatever its current physical ts
  // type — Tables.asTimestamp adapts) and asserts the emitted closed
  // windows equal the batch run on the same files, the
  // batch-streaming unification the operator claims.
  test("streaming: windowedDqSummary over the real events parquet matches batch") {
    val src = new java.io.File("/root/testdata/sf0.001/events.parquet")
    assume(src.exists, s"$src not present")
    val dir = java.nio.file.Files.createTempDirectory("graft_evstream").toFile
    try {
      java.nio.file.Files.copy(src.toPath,
        new java.io.File(dir, "part-00000.parquet").toPath)
      val batchEv = spark.read.parquet(dir.getAbsolutePath)
      val specs = Seq(
        "value" -> Seq(Rule.NumBetween(10, 90)),
        "event_type" -> Seq(Rule.LenBetween(5, 8)))
      def summarize(df: org.apache.spark.sql.DataFrame) =
        StreamingDQ.windowedDqSummary(
          df.withColumn("ts2", Tables.asTimestamp(batchEv, "ts")),
          "ts2", specs, "1 day", "1 day")
      def key(r: org.apache.spark.sql.Row) =
        (r.getAs[Timestamp]("window_start").toString, r.getAs[String]("column"),
          r.getAs[Long]("total"), r.getAs[Long]("null_records"),
          r.getAs[Long]("out_of_format_records"),
          r.getAs[Long]("proper_format_records"), r.getAs[Double]("dq_score"))
      // batch run (watermark is a no-op in batch): every window
      val expected = summarize(batchEv).collect().map(key).toSet
      assert(expected.nonEmpty)
      val stream = spark.readStream.schema(batchEv.schema)
        .parquet(dir.getAbsolutePath)
      val q = summarize(stream).writeStream.format("memory")
        .queryName("evfile_out").outputMode(OutputMode.Append()).start()
      try {
        q.processAllAvailable()
        // a sentinel event far past the data advances the watermark so
        // every REAL window closes; its own (still-open) window is the
        // only one append mode withholds
        val sentinel = batchEv.orderBy(col("ts").desc).limit(1)
          .withColumn("ts", expr("timestampadd(DAY, 30, ts)"))
        sentinel.coalesce(1).write.mode("append").parquet(dir.getAbsolutePath)
        q.processAllAvailable()
        val got = spark.sql("SELECT * FROM evfile_out").collect().map(key).toSet
        assert(got == expected,
          s"streamed windows != batch windows (missing: ${expected -- got}, " +
            s"extra: ${got -- expected})")
      } finally q.stop()
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir)
    }
  }
}
