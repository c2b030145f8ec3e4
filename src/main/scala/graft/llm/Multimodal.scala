package graft.llm

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal column handling: media (image/audio/video) as opaque
  * `BINARY` payloads with typed metadata, processed in batch-shaped
  * partition passes — the Scala analog of `mapInPandas` plumbing: typed
  * `Dataset.mapPartitions` over an iterator, so a real codec would
  * amortize per-batch setup (model load, decoder init) exactly once per
  * partition.
  *
  * CODEC NOTE: image payloads with a PNG signature decode through the
  * REAL JDK codec (`javax.imageio` — no external dependency): true
  * width/height from the decoded raster plus a pixel probe, and
  * `resize` resamples through `Graphics2D` and re-encodes. Non-image
  * payloads (and the audio/video formats whose libraries aren't in
  * this container) fall back to a deterministic fake probe so an
  * independent SQL oracle can still replicate the pipeline shape; swap
  * `fakeDecode` for the codec of choice to productionize those.
  */
object Multimodal {

  // ImageIO defaults to a FILE-BACKED stream cache: every read/write
  // round-trips a temp file through one shared cache directory, which
  // serializes concurrent codec work across executor threads (the
  // resize pass measured ~3x slower than its own codec cost from this
  // alone). In-memory cache is lock-free per stream. Executor JVMs hit
  // this object init before first use, so the switch applies wherever
  // the partition passes run.
  javax.imageio.ImageIO.setUseCache(false)

  case class MediaMeta(width: Int, height: Int, frames: Int, format: String,
      px0: Int)
  case class MediaItem(doc_id: Long, payload: Array[Byte])
  case class DecodedItem(doc_id: Long, byte_len: Long, meta: MediaMeta)

  private val PngMagic: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** PNG signature sniff — cheap, exact, and the dispatch point between
    * the real JDK codec and the deterministic fake. */
  def isPng(payload: Array[Byte]): Boolean =
    payload.length >= 8 && PngMagic.indices.forall(i => payload(i) == PngMagic(i))

  /** JPEG SOI marker sniff (FF D8 FF) — ImageIO decodes JPEG out of the
    * box too, so both mainstream image formats take the real-codec
    * path. */
  def isJpeg(payload: Array[Byte]): Boolean =
    payload.length >= 3 && (payload(0) & 0xFF) == 0xFF &&
      (payload(1) & 0xFF) == 0xD8 && (payload(2) & 0xFF) == 0xFF

  /** Image dispatch: formats the JDK codec handles natively. */
  def isImage(payload: Array[Byte]): Boolean =
    isPng(payload) || isJpeg(payload)

  /** Deterministic stand-in for a codec probe (non-image payloads). */
  private def fakeDecode(payload: Array[Byte]): MediaMeta = {
    val n = payload.length
    MediaMeta(width = n % 1024, height = (n * 7) % 768, frames = n % 30 + 1,
      format = if (n % 2 == 0) "even" else "odd", px0 = n % 997)
  }

  /** REAL decode via the JDK's ImageIO: true raster dimensions plus the
    * top-left pixel (RGB, alpha masked off) as a round-trip probe — for
    * PNG (lossless) the pixel must survive encode→decode bit-exactly.
    * Falls back to [[fakeDecode]] if the codec rejects the bytes
    * (truncated/corrupt payload). */
  private def imageDecode(payload: Array[Byte]): MediaMeta = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    if (img == null) fakeDecode(payload)
    else MediaMeta(img.getWidth, img.getHeight, frames = 1,
      format = if (isJpeg(payload)) "jpeg" else "png",
      px0 = img.getRGB(0, 0) & 0xFFFFFF)
  }

  /** Encode a solid-`rgb` width x height PNG — the deterministic image
    * fixture generator (tests and the `q_mm_*_png` oracles predict the
    * decoded dimensions and pixel from the same arithmetic). */
  def encodePng(width: Int, height: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var x = 0
    while (x < width) {
      var y = 0
      while (y < height) { img.setRGB(x, y, rgb); y += 1 }
      x += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Encode a solid-`rgb` width x height JPEG — the lossy-codec
    * counterpart of [[encodePng]]. JPEG round-trips are NOT bit-exact
    * (DC quantization + YCbCr rounding), but a UNIFORM GRAY image
    * (r=g=b) keeps chroma at exactly 128 and confines the error to the
    * luma DC step: decode(encode(gray v)) lands within ±3 of v per
    * channel — the tolerance the q_mm_decode_jpeg gate rides. */
  def encodeJpeg(width: Int, height: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var x = 0
    while (x < width) {
      var y = 0
      while (y < height) { img.setRGB(x, y, rgb); y += 1 }
      x += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Wrap any table with a binary payload column into the typed media
    * shape. */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String)
      (implicit spark: SparkSession): Dataset[MediaItem] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"),
      col(payloadCol).cast("binary").as("payload")).as[MediaItem]
  }

  /** Batched decode pass — one iterator per partition (mapInPandas-shaped:
    * per-partition init happens once, items stream through). */
  def decode(items: Dataset[MediaItem])
      (implicit spark: SparkSession): Dataset[DecodedItem] = {
    import spark.implicits._
    items.mapPartitions { it =>
      // per-partition init would go here (codec/model handle)
      it.map { m =>
        val meta = if (isImage(m.payload)) imageDecode(m.payload)
                   else fakeDecode(m.payload)
        DecodedItem(m.doc_id, m.payload.length.toLong, meta)
      }
    }
  }

  case class MediaFeatures(doc_id: Long, features: Array[Float])

  /** Batched feature extraction (the embedding-model pass of a training
    * pipeline): one partition = one model session. STUB: features
    * derive deterministically from the payload length so an
    * independent SQL oracle can replicate them; swap the tabulate for
    * an encoder call to productionize. */
  def featureExtract(items: Dataset[MediaItem], dim: Int = 8)
      (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    items.mapPartitions { it =>
      // per-partition init (encoder/model handle) would go here
      it.map { m =>
        val n = m.payload.length
        MediaFeatures(m.doc_id,
          Array.tabulate(dim)(i => ((n * (i + 1)) % 97) / 97.0f))
      }
    }
  }

  /** Batched resize pass. Image payloads (PNG/JPEG) resample for REAL:
    * decode, `Graphics2D.drawImage` onto a width x height raster
    * (bilinear), re-encode — output is normalized to PNG (the usual
    * training-pipeline choice: one lossless format after the resize).
    * Non-image payloads keep the honest stub (truncate to the pixel
    * budget) so the SQL oracle can replicate them. */
  def resize(items: Dataset[MediaItem], width: Int, height: Int)
      (implicit spark: SparkSession): Dataset[MediaItem] = {
    import spark.implicits._
    val budget = width * height
    items.mapPartitions { it =>
      it.map { m =>
        if (isImage(m.payload)) {
          val src = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(m.payload))
          if (src == null)
            MediaItem(m.doc_id, java.util.Arrays.copyOf(
              m.payload, math.min(m.payload.length, budget)))
          else {
            val dst = new java.awt.image.BufferedImage(
              width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = dst.createGraphics()
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(src, 0, 0, width, height, null)
            g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(dst, "png", bos)
            MediaItem(m.doc_id, bos.toByteArray)
          }
        } else MediaItem(m.doc_id, java.util.Arrays.copyOf(
          m.payload, math.min(m.payload.length, budget)))
      }
    }
  }

  /** Frame sampling: split the payload into `n` evenly-sized chunks via
    * binary substring — pure column ops, no decode needed for the
    * plumbing (a real pipeline would decode each chunk downstream). */
  def frameSample(df: DataFrame, payloadCol: String, n: Int): DataFrame = {
    val len = length(col(payloadCol))
    val chunk = greatest(ceil(len / n).cast("int"), lit(1))
    df.withColumn("frames",
      transform(sequence(lit(0), lit(n - 1)),
        i => col(payloadCol).substr(i * chunk + 1, chunk)))
  }
}
