package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One media blob: opaque bytes + typed metadata (SURVEY §7.1 multimodal). */
case class MediaItem(doc_id: Long, modality: String, n_chars: Long, bytes: Array[Byte])

/** Extracted per-item features. */
case class MediaFeature(
    doc_id: Long, modality: String, n_bytes: Int,
    width: Int, height: Int, channels: Int)

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, decoded partition-wise.
  *
  * The decode step is a STUB — image/audio codecs are not present in this
  * container — replaced by a deterministic fake derived from the byte
  * content. The Spark-side plumbing is real: binary column construction,
  * typed `Dataset[MediaItem]`, partition-wise batch processing via
  * `mapPartitions` (the Scala analogue of `mapInPandas` batches: one
  * decoder instantiation per partition, streamed rows, no driver collect).
  */
object Multimodal {

  /** Stand-in media table: text bytes as the blob, source-derived modality
    * (length-based so the derivation is engine-portable for the oracle). */
  def toMedia(docs: DataFrame): Dataset[MediaItem] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id"),
      element_at(
        typedLit(Seq("image", "audio", "video")),
        (length(col("source")) % 3 + 1).cast("int")).as("modality"),
      col("n_chars"),
      col("text").cast("binary").as("bytes"))
      .as[MediaItem]
  }

  /** STUB decoder: deterministic pseudo-features from a byte-content hash.
    * A real implementation would decode the blob here (e.g. JPEG headers /
    * PCM frames) with one codec instance per partition. */
  def extractFeatures(media: Dataset[MediaItem]): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition "decoder" setup happens once, here
      it.map { m =>
        val h = java.util.Arrays.hashCode(m.bytes)
        MediaFeature(
          doc_id = m.doc_id,
          modality = m.modality,
          n_bytes = m.bytes.length,
          width = 16 + Math.floorMod(h, 1024),
          height = 16 + Math.floorMod(h >> 10, 1024),
          channels = 1 + Math.floorMod(h >> 20, 4))
      }
    }
  }
}
