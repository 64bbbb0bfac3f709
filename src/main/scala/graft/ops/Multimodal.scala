package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video travel as opaque
  * `binary` columns with a typed metadata struct; decode / feature
  * extraction runs batched on executors via `mapPartitions`.
  *
  * All three modality paths decode REAL containers with JDK codecs:
  *   - IMAGE: [[featurize]] decodes PNG/JPEG via `javax.imageio` and
  *     aggregates actual pixel statistics; [[resizeImages]] re-rasters
  *     and re-encodes (battery q47/q101, analytic oracles).
  *   - AUDIO: [[audioFeatures]] decodes RIFF/WAVE PCM via
  *     `javax.sound.sampled` (battery q100).
  *   - VIDEO: [[videoFrameFeatures]] opens a multi-frame container
  *     (animated GIF — the one the JDK can both write and read), counts
  *     frames from the stream, and decodes every `n`-th frame's raster
  *     (battery q102). An mp4/webm deployment swaps the ImageIO reader
  *     for an ffmpeg/JNI frame iterator; the schema, sampling logic, and
  *     narrow partition shape are unchanged.
  * [[explodeFrames]]/[[resize]] remain as the OPAQUE-BLOB path: evenly
  * spaced byte slices / byte downsampling for payloads with no
  * registered codec (modality-agnostic quarantine-friendly shape).
  *
  * Scale notes: assets are processed as a narrow map over the scan (no
  * shuffle); binary columns should be written with a small
  * `maxPartitionBytes` so one task never holds too many blobs; metadata
  * filters (e.g. `meta.n_bytes > 0`) are struct-field pushdown-able.
  * `ImageIO.setUseCache(false)` keeps decodes in-memory — the default
  * disk-backed cache would write a temp file per asset, a hidden
  * executor-local I/O tax at 10⁸ images.
  */
object Multimodal {

  // in-memory ImageIO, no AWT display dependency — executor-safe
  private lazy val imageIoInit: Unit = {
    System.setProperty("java.awt.headless", "true")
    javax.imageio.ImageIO.setUseCache(false)
  }

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

  /** Deterministic synthetic PNG for asset `id` — the q47 fixture and a
    * general test pattern: a `(2 + id mod 7) × (2 + id mod 5)` RGB image
    * whose channels are exact functions of (id, x, y), so the decoded
    * pixel statistics have a closed form an independent oracle can
    * compute from `id` alone:
    *
    *   r(x,y) = id mod 199 + x        → mean_r = id mod 199 + (w-1)/2
    *   g(x,y) = (id·7) mod 199 + y    → mean_g = (id·7) mod 199 + (h-1)/2
    *   b(x,y) = (id·13) mod 199       → mean_b = (id·13) mod 199
    *
    * (bases < 199 and offsets ≤ 7 keep every channel < 256 — no
    * wraparound, so the means are exact.) The bytes are a REAL PNG
    * (deflate, filters, CRCs) produced by `javax.imageio`; decoding
    * them exercises the same codec path production image data takes. */
  def syntheticPng(id: Long): Array[Byte] = {
    imageIoInit
    val w = (2 + Math.floorMod(id, 7)).toInt
    val h = (2 + Math.floorMod(id, 5)).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val baseR = Math.floorMod(id, 199).toInt
    val baseG = Math.floorMod(id * 7, 199).toInt
    val baseB = Math.floorMod(id * 13, 199).toInt
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, ((baseR + x) << 16) | ((baseG + y) << 8) | baseB)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Decoded raster or null — shared by featurize and resize. */
  private def readImage(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    if (bytes == null || bytes.isEmpty) return null
    imageIoInit
    try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    catch { case _: java.io.IOException => null }
  }

  /** REAL image decode: PNG/JPEG (any registered ImageIO reader) →
    * (width, height, mean_r, mean_g, mean_b). None for null/undecodable
    * bytes. */
  private[graft] def decodeImage(
      bytes: Array[Byte]): Option[(Int, Int, Double, Double, Double)] = {
    val img = readImage(bytes)
    if (img == null) return None
    val (w, h) = (img.getWidth, img.getHeight)
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    Some((w, h, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n))
  }

  /** Deterministic synthetic multi-frame GIF for asset `id` — the video
    * twin of [[syntheticPng]] and the fixture that makes the VIDEO path
    * real: an animated GIF is the one multi-frame container the JDK can
    * both write and read (`javax.imageio`'s GIF plugin), so frame
    * extraction below decodes an actual container — frame count from the
    * stream, per-frame rasters through the real LZW/palette codec — not
    * a byte-slice stand-in. `2 + id mod 4` frames of `(2 + id mod 7) ×
    * (2 + id mod 5)` solid color, each channel a closed form of
    * (id, frame) an independent oracle can compute from `id` alone:
    *
    *   r(f) = (id + 17·f) mod 199     → mean_r = r(f) exactly
    *   g(f) = (id·7 + 23·f) mod 199   → mean_g = g(f) exactly
    *   b(f) = (id·13 + 29·f) mod 199  → mean_b = b(f) exactly
    *
    * (solid frames keep the GIF palette exact — no quantization — so
    * decoded means are integers, not approximations). */
  def syntheticGif(id: Long): Array[Byte] = {
    imageIoInit
    val k = (2 + Math.floorMod(id, 4)).toInt
    val w = (2 + Math.floorMod(id, 7)).toInt
    val h = (2 + Math.floorMod(id, 5)).toInt
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      wr.setOutput(ios)
      wr.prepareWriteSequence(null)
      var f = 0
      while (f < k) {
        val r = Math.floorMod(id + 17L * f, 199).toInt
        val g = Math.floorMod(id * 7 + 23L * f, 199).toInt
        val b = Math.floorMod(id * 13 + 29L * f, 199).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val rgb = (r << 16) | (g << 8) | b
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        wr.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      wr.endWriteSequence()
    } finally { wr.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Generate a synthetic-GIF asset per row of `df` — REAL animated-GIF
    * bytes encoded on executors, in the canonical asset shape (the q102
    * fixture; video twin of [[imageAssets]]/[[audioAssets]]). */
  def videoAssets(df: DataFrame, idCol: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(assetSchema)
    df.select(col(idCol).cast("long").as("asset_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val gif = syntheticGif(id)
        Row(id, "video", gif, Row(gif.length.toLong, "gif"))
      }
    }(enc)
  }

  /** REAL video-frame extraction: open the container with the JDK's
    * multi-frame ImageIO reader (GIF), take every `every`-th frame
    * (frame 0 always included — the standard thumbnail/keyframe
    * sampling shape), decode each sampled raster, and emit its pixel
    * statistics. Output: (asset_id, n_frames, frame_no, width, height,
    * mean_r, mean_g, mean_b), one row per SAMPLED frame. Narrow map —
    * one container decoded at a time per task, no shuffle at any scale.
    * Undecodable/null payloads emit one quarantine row with null
    * n_frames/frame stats (same never-drop contract as [[featurize]]). */
  def videoFrameFeatures(assets: DataFrame, every: Int = 1): DataFrame = {
    require(every >= 1, s"every must be >= 1, got $every")
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("n_frames", IntegerType, nullable = true),
      StructField("frame_no", IntegerType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("mean_r", DoubleType, nullable = true),
      StructField("mean_g", DoubleType, nullable = true),
      StructField("mean_b", DoubleType, nullable = true)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    assets.select("asset_id", "bytes").mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        decodeFrames(r.getAs[Array[Byte]](1), every) match {
          case Some((n, frames)) =>
            frames.map { case (f, w, h, mr, mg, mb) =>
              Row(id, n, f, w, h, mr, mg, mb)
            }
          case None => Seq(Row(id, null, null, null, null, null, null, null))
        }
      }
    }(enc)
  }

  /** Multi-frame decode core: (total frame count, sampled-frame stats).
    * None for null/unreadable bytes or a reader with zero frames. */
  private[graft] def decodeFrames(
      bytes: Array[Byte],
      every: Int): Option[(Int, Seq[(Int, Int, Int, Double, Double, Double)])] = {
    if (bytes == null || bytes.isEmpty) return None
    imageIoInit
    val iis =
      try javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException => return None }
    val readers = javax.imageio.ImageIO.getImageReaders(iis)
    if (!readers.hasNext) { iis.close(); return None }
    val rd = readers.next()
    try {
      rd.setInput(iis)
      // allowSearch: a forward scan of the stream counts frames without
      // decoding rasters — cheap, and required before random access
      val n = rd.getNumImages(true)
      if (n <= 0) return None
      val out = Seq.newBuilder[(Int, Int, Int, Double, Double, Double)]
      var f = 0
      while (f < n) {
        val img = rd.read(f)
        val (w, h) = (img.getWidth, img.getHeight)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
            x += 1
          }
          y += 1
        }
        val np = w.toLong * h
        out += ((f, w, h, sr.toDouble / np, sg.toDouble / np, sb.toDouble / np))
        f += every
      }
      Some((n, out.result()))
    } catch { case _: java.io.IOException => None }
    finally { rd.dispose(); iis.close() }
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

  /** Generate a synthetic-PNG asset per row of `df` — REAL PNG bytes
    * encoded on executors (narrow map, no shuffle), in the canonical
    * asset shape. The q47 fixture; also the cheapest way to get honest
    * image bytes into any pipeline test. */
  def imageAssets(df: DataFrame, idCol: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(assetSchema)
    df.select(col(idCol).cast("long").as("asset_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val png = syntheticPng(id)
        Row(id, "image", png, Row(png.length.toLong, "png"))
      }
    }(enc)
  }

  /** Batched executor-side image featurization: assets → (asset_id,
    * width, height, mean_r, mean_g, mean_b) via a REAL `javax.imageio`
    * decode of each payload. One pass, no shuffle; rows stream lazily so
    * one decoded image at a time is resident per task. Null or
    * undecodable payloads (wrong codec, truncated file, non-image blob)
    * yield null stats — filter `width IS NULL` downstream to quarantine
    * them; never a task failure. */
  def featurize(assets: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("mean_r", DoubleType, nullable = true),
      StructField("mean_g", DoubleType, nullable = true),
      StructField("mean_b", DoubleType, nullable = true)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    assets.select("asset_id", "bytes").mapPartitions { rows =>
      rows.map { r =>
        decodeImage(r.getAs[Array[Byte]](1)) match {
          case Some((w, h, mr, mg, mb)) => Row(r.getLong(0), w, h, mr, mg, mb)
          case None => Row(r.getLong(0), null, null, null, null, null)
        }
      }
    }(enc)
  }

  /** Deterministic synthetic WAV for asset `id` — the audio twin of
    * [[syntheticPng]]: `64 + id mod 64` samples of 16-bit mono PCM at
    * 8 kHz whose amplitudes are a closed-form ramp an independent
    * oracle can compute from `id` alone:
    *
    *   s(i) = id mod 1000 + 3·i       (max 999 + 3·127 = 1380 « 32767)
    *   → n_samples = 64 + id mod 64
    *   → mean_amp  = id mod 1000 + 3(n-1)/2
    *   → peak_amp  = id mod 1000 + 3(n-1)
    *
    * The bytes are a REAL RIFF/WAVE container produced by
    * `javax.sound.sampled.AudioSystem`; decoding them exercises the
    * JDK's actual audio codec path. */
  def syntheticWav(id: Long): Array[Byte] = {
    val n = (64 + Math.floorMod(id, 64)).toInt
    val base = Math.floorMod(id, 1000).toInt
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = base + 3 * i
      pcm(2 * i) = (s & 0xFF).toByte // little-endian 16-bit
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** REAL audio decode via `javax.sound.sampled`: WAV (16-bit signed
    * PCM, any channel count the JDK reader accepts) → (sample_rate,
    * channels, n_samples, mean amplitude, peak amplitude) over all
    * channels. None for null/undecodable bytes or non-16-bit encodings
    * (the honest boundary: the JDK ships no mp3/ogg codec). */
  private[graft] def decodeAudio(
      bytes: Array[Byte]): Option[(Int, Int, Long, Double, Int)] = {
    if (bytes == null || bytes.isEmpty) return None
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (ais == null) return None
    try {
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16) return None
      val data = ais.readAllBytes()
      val n = data.length / 2
      if (n == 0) return None
      val big = fmt.isBigEndian
      var (sum, peak) = (0L, Int.MinValue)
      var i = 0
      while (i < n) {
        val lo = data(2 * i) & 0xFF
        val hi = data(2 * i + 1) & 0xFF
        val s = (if (big) (lo << 8) | hi else (hi << 8) | lo).toShort.toInt
        sum += s; if (s > peak) peak = s
        i += 1
      }
      Some((fmt.getSampleRate.toInt, fmt.getChannels,
        n.toLong / fmt.getChannels, sum.toDouble / n, peak))
    } finally ais.close()
  }

  /** Generate a synthetic-WAV asset per row of `df` — REAL RIFF bytes
    * encoded on executors, in the canonical asset shape (the q100
    * fixture; audio twin of [[imageAssets]]). */
  def audioAssets(df: DataFrame, idCol: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(assetSchema)
    df.select(col(idCol).cast("long").as("asset_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val wav = syntheticWav(id)
        Row(id, "audio", wav, Row(wav.length.toLong, "wav"))
      }
    }(enc)
  }

  /** Batched executor-side audio featurization: assets → (asset_id,
    * sample_rate, channels, n_samples, mean_amp, peak_amp) via a REAL
    * `javax.sound.sampled` decode. Same null contract as [[featurize]]. */
  def audioFeatures(assets: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("channels", IntegerType, nullable = true),
      StructField("n_samples", LongType, nullable = true),
      StructField("mean_amp", DoubleType, nullable = true),
      StructField("peak_amp", IntegerType, nullable = true)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    assets.select("asset_id", "bytes").mapPartitions { rows =>
      rows.map { r =>
        decodeAudio(r.getAs[Array[Byte]](1)) match {
          case Some((sr, ch, ns, mean, peak)) =>
            Row(r.getLong(0), sr, ch, ns, mean, peak)
          case None => Row(r.getLong(0), null, null, null, null, null)
        }
      }
    }(enc)
  }

  /** REAL image resize: decode → nearest-neighbor raster scale so the
    * longer side is at most `maxDim` (aspect preserved) → PNG
    * re-encode. Nearest-neighbor, deliberately: `srcX = x·sw/dw`
    * (floor) is exact integer sampling with no interpolation or
    * rounding ambiguity, so resized pixel content keeps closed forms an
    * oracle can verify (q101: the constant channel's mean is invariant
    * under any subsampling; dims are `max(1, d·maxDim/max(sw,sh))`).
    * Already-small and undecodable payloads pass through unchanged —
    * resizing a corpus must never drop the rows a decoder can't read
    * (they are the rows quality filters want to SEE). */
  def resizeImages(assets: DataFrame, maxDim: Int): DataFrame = {
    require(maxDim > 0, s"maxDim must be positive, got $maxDim")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(assetSchema)
    assets.select("asset_id", "modality", "bytes", "meta").mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](2)
        val img = readImage(bytes)
        val big = img != null && math.max(img.getWidth, img.getHeight) > maxDim
        if (!big) Row(r.getLong(0), r.getString(1), bytes, r.getStruct(3))
        else {
          val (sw, sh) = (img.getWidth, img.getHeight)
          val m = math.max(sw, sh)
          val (dw, dh) = (math.max(1, sw * maxDim / m), math.max(1, sh * maxDim / m))
          val out = new java.awt.image.BufferedImage(
            dw, dh, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < dh) {
            var x = 0
            while (x < dw) {
              out.setRGB(x, y, img.getRGB(x * sw / dw, y * sh / dh))
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          val png = bos.toByteArray
          val meta = r.getStruct(3)
          Row(r.getLong(0), r.getString(1), png,
            Row(png.length.toLong, if (meta == null) null else meta.getString(1)))
        }
      }
    }(enc)
  }

  /** STUB resize: deterministic fixed-size byte downsample (`target`
    * evenly spaced bytes) — the opaque-blob / video-path stand-in (see
    * object scaladoc; the image path decodes for real). Assets already
    * at or below `target` pass through unchanged. */
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
