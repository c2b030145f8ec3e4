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
  * STUB NOTE: no image/audio libraries exist in this container, so
  * `decode` derives deterministic fake dimensions from the payload
  * bytes. The Spark-side contract — schema, encoders, partition
  * batching, pushdown-friendly metadata projection — is real and
  * tested; swap `fakeDecode` for a codec call to productionize.
  */
object Multimodal {

  case class MediaMeta(width: Int, height: Int, frames: Int, format: String)
  case class MediaItem(doc_id: Long, payload: Array[Byte])
  case class DecodedItem(doc_id: Long, byte_len: Long, meta: MediaMeta)

  /** Deterministic stand-in for a codec probe. */
  private def fakeDecode(payload: Array[Byte]): MediaMeta = {
    val n = payload.length
    MediaMeta(width = n % 1024, height = (n * 7) % 768, frames = n % 30 + 1,
      format = if (n % 2 == 0) "even" else "odd")
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
      it.map(m => DecodedItem(m.doc_id, m.payload.length.toLong, fakeDecode(m.payload)))
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

  /** Batched resize pass. STUB: "resampling" truncates the payload to
    * the target pixel budget — the real contract (typed in/out, per-
    * partition batching, payload bytes rewritten) is what's exercised. */
  def resize(items: Dataset[MediaItem], width: Int, height: Int)
      (implicit spark: SparkSession): Dataset[MediaItem] = {
    import spark.implicits._
    val budget = width * height
    items.mapPartitions { it =>
      it.map(m => MediaItem(m.doc_id,
        java.util.Arrays.copyOf(m.payload, math.min(m.payload.length, budget))))
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
