package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns next to a typed metadata struct. The
  * Spark-side mechanics — schema, partition-sized batching,
  * mapPartitions signature, deterministic output shape — are real;
  * the codec itself is STUBBED (this container has no image/audio
  * libraries) behind `Codec`, with a deterministic fake so the
  * pipeline is testable end-to-end.
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

  /** Resize stage stub: rewrites payloads to a deterministic
    * byte-budget for the target geometry and stamps the new
    * dimensions into the metadata (width/height are the fields real
    * decoders fill). A real implementation swaps the byte truncation
    * for an image scaler; the Dataset→Dataset shape, meta propagation
    * and per-partition batching are what downstream stages rely on.
    */
  def resize(ds: Dataset[MediaRow], width: Int, height: Int): Dataset[MediaRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val budget = math.max(width * height / 8, 1)
    ds.mapPartitions { rows =>
      rows.map { r =>
        val bytes =
          if (r.media.length <= budget) r.media
          else java.util.Arrays.copyOfRange(r.media, 0, budget)
        MediaRow(r.id, bytes,
          MediaMeta(r.meta.format, width, height, bytes.length.toLong))
      }
    }
  }

  /** Frame-sampling stub for video payloads: emits `n` byte-slices
    * per payload with frame indices — the real implementation swaps
    * the slicer for a demuxer; the explode/partitioning shape is
    * identical.
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
