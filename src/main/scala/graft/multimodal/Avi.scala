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
        inMovi = false, depth = 0, out)
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

  /** RIFF practical nesting is ~3 (RIFF > movi > rec ); 32 tolerates
    * exotic-but-legal files while making a crafted LIST-of-LIST bomb
    * a clean empty return instead of a StackOverflowError.
    */
  private val MaxDepth = 32

  private def walk(b: Array[Byte], start: Int, end: Int, inMovi: Boolean,
                   depth: Int,
                   out: scala.collection.mutable.Builder[Array[Byte], _]): Unit = {
    if (depth > MaxDepth) return
    var off = start
    while (off + 8 <= end) {
      val id = fourCC(b, off)
      val size = u32(b, off + 4) // unsigned 32-bit: keep ALL arithmetic in Long
      val dataOff = off + 8
      val dataEnd = math.min(dataOff + size, end.toLong).toInt
      if (id == "LIST" && dataEnd - dataOff >= 4) {
        val listType = fourCC(b, dataOff)
        walk(b, dataOff + 4, dataEnd, inMovi || listType == "movi", depth + 1, out)
      } else if (inMovi && isFrameId(id) && size > 0 && dataEnd <= b.length) {
        out += java.util.Arrays.copyOfRange(b, dataOff, dataEnd)
      }
      // Word-aligned advance, computed in Long: a crafted size near
      // 2^32 must terminate the scan, never step 0/backwards (which
      // would hang the executor task with no exception to catch).
      val next = dataOff.toLong + size + (size & 1L)
      if (next <= off || next > end) return
      off = next.toInt
    }
  }
}
