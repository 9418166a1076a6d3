package graft.multimodal

/** Minimal RIFF/AVI demuxer, JDK-only: enough container parsing to
  * pull the video frame chunks out of an MJPEG AVI (each frame is a
  * complete JPEG, decodable by [[Multimodal.ImageCodec]]). This is
  * the honest scope line for video without native libraries:
  * CONTAINER demux is plain byte parsing (done here), per-frame
  * IMAGE decode is `javax.imageio` (done in ImageCodec) — only
  * inter-frame compressed codecs (H.264 etc.) genuinely require
  * native decoders and remain out of scope.
  *
  * Format notes: an AVI is a RIFF file (`RIFF <size> AVI `), a tree
  * of chunks (`<4cc> <size> <data>`, word-aligned) and LIST chunks
  * (`LIST <size> <type> <children>`); frames live in the `movi` LIST
  * as `NNdc`/`NNdb` chunks (NN = stream id digits, dc = compressed,
  * db = uncompressed). Index/header chunks are skipped — frame
  * ORDER inside `movi` is the presentation order for the
  * single-video-stream files this targets.
  */
object Avi {

  /** Video frame payloads ('..dc'/'..db' chunks under the `movi`
    * LIST) in file order; empty when `bytes` is not a parseable AVI.
    */
  def frames(bytes: Array[Byte]): IndexedSeq[Array[Byte]] = {
    try {
      if (bytes.length < 12) return Vector.empty
      if (fourCC(bytes, 0) != "RIFF" || fourCC(bytes, 8) != "AVI ")
        return Vector.empty
      val out = Vector.newBuilder[Array[Byte]]
      walk(bytes, 12, math.min(12L + u32(bytes, 4) - 4, bytes.length.toLong).toInt,
        inMovi = false, out)
      out.result()
    } catch { case _: Exception => Vector.empty }
  }

  private def fourCC(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def isFrameId(id: String): Boolean =
    id.length == 4 && id(0).isDigit && id(1).isDigit &&
      id(2) == 'd' && (id(3) == 'c' || id(3) == 'b')

  private def walk(b: Array[Byte], start: Int, end: Int, inMovi: Boolean,
                   out: scala.collection.mutable.Builder[Array[Byte], _]): Unit = {
    var off = start
    while (off + 8 <= end) {
      val id = fourCC(b, off)
      val size = u32(b, off + 4)
      val dataOff = off + 8
      val dataEnd = math.min(dataOff + size, end.toLong).toInt
      if (id == "LIST" && dataEnd - dataOff >= 4) {
        val listType = fourCC(b, dataOff)
        walk(b, dataOff + 4, dataEnd, inMovi || listType == "movi", out)
      } else if (inMovi && isFrameId(id) && size > 0 && dataEnd <= b.length) {
        out += java.util.Arrays.copyOfRange(b, dataOff, dataEnd)
      }
      off = dataOff + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
  }
}
