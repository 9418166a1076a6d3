package graft

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.Warc

class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graft-warc-$tag").toFile
    d.deleteOnExit(); d.getAbsolutePath
  }

  private def docsFrame = Seq(
    ("https://example.org/a/1", "2026-01-01T00:00:00Z", "text/plain; charset=utf-8", "hello warc"),
    ("https://example.org/a/2", "2026-01-01T00:00:01Z", "text/plain; charset=utf-8", "payload with\r\n\r\nembedded CRLFCRLF framing bait"),
    ("https://example.org/b/3", "2026-01-01T00:00:02Z", "text/html", "<p>unicode: ağaç çiçek</p>"),
    ("https://example.org/b/4", "2026-01-01T00:00:03Z", "text/plain", "")
  ).toDF("target_uri", "warc_date", "content_type", "text")
    .withColumn("content", encode(col("text"), "UTF-8"))

  private def roundTrip(gzip: Boolean, tag: String): Unit = {
    val dir = tmpDir(tag)
    Warc.writeWarcPartitioned(docsFrame.repartition(2), dir, gzip = gzip)
    val ext = if (gzip) ".warc.gz" else ".warc"
    val parts = new java.io.File(dir).listFiles.filter(_.getName.endsWith(ext))
    assert(parts.length == 2, s"expected 2 part files, got ${parts.toSeq}")
    val back = Warc.readWarc(spark, dir)
    assert(back.filter($"warc_type" === "warcinfo").count() == 2) // one per file
    val res = back.filter($"warc_type" === "resource")
      .select($"target_uri", $"warc_date", $"content_type",
        decode($"content", "UTF-8").as("text"), $"record_id")
      .orderBy("target_uri").collect()
    val want = docsFrame.select("target_uri", "warc_date", "content_type", "text")
      .orderBy("target_uri").collect()
    assert(res.length == want.length)
    res.zip(want).foreach { case (r, w) =>
      assert((0 to 3).forall(i => r.get(i) == w.get(i)), s"$r != $w")
      assert(r.getString(4).startsWith("<urn:uuid:"))
    }
    // record IDs are deterministic: a re-export yields the same set
    val dir2 = tmpDir(tag + "2")
    Warc.writeWarcPartitioned(docsFrame.repartition(2), dir2, gzip = gzip)
    val ids = Warc.readWarc(spark, dir).select("record_id").as[String].collect().sorted.toSeq
    val ids2 = Warc.readWarc(spark, dir2).select("record_id").as[String].collect().sorted.toSeq
    assert(ids == ids2)
  }

  test("plain .warc round-trips byte-exact (CRLFCRLF bait, unicode, empty block)") {
    roundTrip(gzip = false, "plain")
  }

  test(".warc.gz round-trips through per-record gzip members") {
    roundTrip(gzip = true, "gz")
  }

  test("re-export overwrites stale parts (wider previous export does not leak)") {
    val dir = tmpDir("swap")
    Warc.writeWarcPartitioned(docsFrame.repartition(4), dir, gzip = false)
    // empty partitions write no file — round-robin of 4 rows may land 3 parts
    assert(new java.io.File(dir).listFiles.count(_.getName.endsWith(".warc")) >= 2)
    Warc.writeWarcPartitioned(docsFrame.limit(2).repartition(1), dir, gzip = false)
    assert(new java.io.File(dir).listFiles.count(_.getName.endsWith(".warc")) == 1)
    assert(Warc.readWarc(spark, dir).filter($"warc_type" === "resource").count() == 2)
  }

  test("application/http response records unwrap to status + content-type + body") {
    val body = "<html>ok</html>"
    val http = s"HTTP/1.1 200 OK\r\nServer: x\r\nContent-Type: text/html; charset=UTF-8\r\n\r\n$body"
    val block = http.getBytes(ISO_8859_1)
    val rec = new StringBuilder("WARC/1.0\r\n")
      .append("WARC-Type: response\r\n")
      .append("WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-000000000001>\r\n")
      .append("WARC-Date: 2026-01-01T00:00:00Z\r\n")
      .append("WARC-Target-URI: https://example.org/h\r\n")
      .append("Content-Type: application/http; msgtype=response\r\n")
      .append(s"Content-Length: ${block.length}\r\n\r\n")
    val bytes = rec.toString.getBytes(ISO_8859_1) ++ block ++ "\r\n\r\n".getBytes(ISO_8859_1)
    val f = Files.createTempFile("graft-warc-http", ".warc")
    Files.write(f, bytes)
    val out = Warc.readWarc(spark, f.toString).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[String]("warc_type") == "response")
    assert(r.getAs[Int]("http_status") == 200)
    assert(r.getAs[String]("http_content_type") == "text/html; charset=UTF-8")
    assert(new String(r.getAs[Array[Byte]]("content"), UTF_8) == body)
    // unwrapHttp=false keeps the raw HTTP message as the block
    val raw = Warc.readWarc(spark, f.toString, unwrapHttp = false).collect()(0)
    assert(raw.isNullAt(raw.fieldIndex("http_status")))
    assert(new String(raw.getAs[Array[Byte]]("content"), ISO_8859_1) == http)
  }

  test("malformed framing throws loudly (bad version line, missing Content-Length, short block)") {
    def parse(s: String) = Warc.parseAll(s.getBytes(ISO_8859_1)).toList
    intercept[IllegalArgumentException] { parse("NOT-A-WARC\r\n\r\n") }
    intercept[IllegalArgumentException] {
      parse("WARC/1.0\r\nWARC-Type: resource\r\n\r\n")
    }
    intercept[java.io.EOFException] {
      parse("WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: 100\r\n\r\nshort")
    }
  }

  test("driver-streamed single-file writer matches the partitioned reader") {
    val f = Files.createTempFile("graft-warc-single", ".warc.gz")
    Warc.writeWarc(docsFrame, f.toString, gzip = true)
    val back = Warc.readWarc(spark, f.toString)
    assert(back.filter($"warc_type" === "resource").count() == 4)
    assert(back.filter($"warc_type" === "warcinfo").count() == 1)
  }
}
