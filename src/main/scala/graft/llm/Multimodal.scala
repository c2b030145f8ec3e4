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
