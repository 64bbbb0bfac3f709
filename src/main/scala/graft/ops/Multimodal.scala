package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video travel as opaque
  * `binary` columns with a typed metadata struct; decode / feature
  * extraction runs batched on executors via `mapPartitions`.
  *
  * The codec itself is STUBBED (this container has no image/audio libs):
  * `decodeStub` derives deterministic features straight from the bytes.
  * Everything around it — the asset schema, the partition-level batching,
  * the feature-vector shape, the Parquet round-trip — is the real
  * plumbing a production decode would plug into: replace `decodeStub`
  * with a JNI/ffmpeg/pillow call and nothing else changes.
  *
  * Scale notes: assets are processed as a narrow map over the scan (no
  * shuffle); binary columns should be written with a small
  * `maxPartitionBytes` so one task never holds too many blobs; metadata
  * filters (e.g. `meta.n_bytes > 0`, or a `width` field if a real codec
  * adds one to the meta struct) are struct-field pushdown-able.
  */
object Multimodal {

  /** Canonical asset schema: (asset_id, modality, bytes, meta). */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType, nullable = true),
      StructField("tag", StringType, nullable = true))), nullable = true)))

  /** Pack any table into the asset shape: `bytesExpr` is encoded to
    * binary, metadata is carried as a typed struct. */
  def toAssets(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      tagCol: String,
      modality: String = "blob"): DataFrame =
    df.select(
      col(idCol).cast("long").as("asset_id"),
      lit(modality).as("modality"),
      col(payloadCol).cast("binary").as("bytes"),
      struct(
        octet_length(col(payloadCol)).cast("long").as("n_bytes"),
        col(tagCol).cast("string").as("tag")).as("meta"))

  /** STUB decoder: deterministic 16-bin byte histogram, normalized.
    * Stands in for image-decode + feature-extract. */
  private[ops] def decodeStub(bytes: Array[Byte]): Array[Double] = {
    val bins = new Array[Double](16)
    if (bytes == null || bytes.isEmpty) return bins
    bytes.foreach(b => bins((b & 0xFF) / 16) += 1.0)
    val n = bytes.length.toDouble
    bins.map(_ / n)
  }

  /** "Frame sampling" stand-in: `n` evenly spaced fixed-width byte slices
    * (what video frame extraction would return). */
  private[ops] def sampleFrames(bytes: Array[Byte], n: Int, width: Int): Seq[Array[Byte]] = {
    if (bytes == null || bytes.isEmpty) return Seq.empty
    val step = math.max(1, bytes.length / n)
    (0 until math.min(n, bytes.length)).map { i =>
      val start = i * step
      bytes.slice(start, math.min(start + width, bytes.length))
    }
  }

  /** Batched executor-side featurization: assets → (asset_id, features).
    * One pass, no shuffle; the stub is the only non-production line. */
  def featurize(assets: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("features", ArrayType(DoubleType), nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    assets.select("asset_id", "bytes").mapPartitions { rows =>
      // rows stream lazily: one blob at a time is resident per task
      rows.map { r =>
        Row(r.getLong(0), decodeStub(r.getAs[Array[Byte]](1)).toSeq)
      }
    }(enc)
  }

  /** STUB resize: deterministic fixed-size byte downsample (`target`
    * evenly spaced bytes) — stands in for image resize exactly like
    * `decodeStub` stands in for decode. Assets already at or below
    * `target` pass through unchanged. */
  private[ops] def resizeStub(bytes: Array[Byte], target: Int): Array[Byte] = {
    if (bytes == null || bytes.length <= target) return bytes
    val out = new Array[Byte](target)
    var i = 0
    while (i < target) {
      // Long arithmetic: i * length overflows Int for blobs > ~34 MB
      out(i) = bytes((i.toLong * bytes.length / target).toInt)
      i += 1
    }
    out
  }

  /** Resize every asset payload to at most `target` bytes, updating
    * `meta.n_bytes` to match. Narrow map, no shuffle — the same
    * plumbing a real image-resize kernel plugs into. */
  def resize(assets: DataFrame, target: Int = 64): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(assetSchema)
    assets.select("asset_id", "modality", "bytes", "meta").mapPartitions { rows =>
      rows.map { r =>
        val resized = resizeStub(r.getAs[Array[Byte]](2), target)
        val meta = r.getStruct(3)
        Row(r.getLong(0), r.getString(1), resized,
          Row(if (resized == null) null else resized.length.toLong,
            if (meta == null) null else meta.getString(1)))
      }
    }(enc)
  }

  /** Frame-sample each asset into child rows (asset_id, frame_no, frame). */
  def explodeFrames(assets: DataFrame, n: Int = 4, width: Int = 32): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    assets.select("asset_id", "bytes").mapPartitions { rows =>
      rows.flatMap { r =>
        sampleFrames(r.getAs[Array[Byte]](1), n, width).zipWithIndex.map {
          case (f, i) => Row(r.getLong(0), i, f)
        }
      }
    }(enc)
  }
}
