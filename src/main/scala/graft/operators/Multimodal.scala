package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One media blob: opaque bytes + typed metadata (SURVEY §7.1 multimodal). */
case class MediaItem(doc_id: Long, modality: String, n_chars: Long, bytes: Array[Byte])

/** Extracted per-item features. */
case class MediaFeature(
    doc_id: Long, modality: String, n_bytes: Int,
    width: Int, height: Int, channels: Int)

/** One sampled frame of a media blob. */
case class MediaFrame(doc_id: Long, frame_idx: Int, offset: Int,
                      n_frame_bytes: Int, checksum: Long)

/** One nearest-neighbor-resized image. */
case class ResizedImage(doc_id: Long, in_w: Int, in_h: Int,
                        out_w: Int, out_h: Int, checksum: Long)

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

  /** FRAME SAMPLING — the video half of the multimodal contract: one
    * blob explodes into its sampled frames partition-wise (the
    * `mapInPandas`-batch shape: rows stream, one decoder per partition,
    * the 1→N fan-out never touches the driver). Frames are every
    * `stride`-th complete `frameBytes` window of the blob, checksummed
    * by unsigned byte sum; a REAL container demuxer replaces the
    * window step (the offsets/indices plumbing, the fan-out, and the
    * per-frame schema are what this verifies — the q126 oracle replays
    * the identical byte arithmetic). The caller routes by modality
    * (`.filter(_.modality == "video")`), as a real pipeline does —
    * sampling is byte arithmetic, routing is policy. */
  def frameSample(media: Dataset[MediaItem], frameBytes: Int,
                  stride: Int): Dataset[MediaFrame] = {
    // fail at plan time, not per-row in executors (frameBytes = 0
    // would divide-by-zero and stride <= 0 would blow Iterator.range
    // inside every task) — the LengthBucket.assign knob convention
    require(frameBytes > 0, s"frameBytes must be positive, got $frameBytes")
    require(stride > 0, s"stride must be positive, got $stride")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        val nFrames = m.bytes.length / frameBytes
        Iterator.range(0, nFrames, stride).map { f =>
          val off = f * frameBytes
          var s = 0L
          var i = off
          while (i < off + frameBytes) { s += (m.bytes(i) & 0xff); i += 1 }
          MediaFrame(m.doc_id, f, off, frameBytes, s)
        }
      }
    }
  }

  /** NEAREST-NEIGHBOR RESIZE — the image half: the stub "decodes" the
    * blob as a row-major single-channel pixel array with the
    * hash-derived dimensions [[extractFeatures]] reports (indices wrap
    * modulo the blob length, since the stand-in blob is shorter than
    * w×h), then samples the standard nearest-neighbor grid
    * (src = out_index × in_dim / out_dim, integer division). The
    * checksum is the unsigned byte sum over the out_w×out_h sampled
    * pixels — deterministic byte arithmetic the q127 oracle replays
    * exactly. A real decoder replaces the pixel fetch; the grid
    * arithmetic, per-partition batching, and schema stay. EMPTY blobs
    * are excluded, not crashed on (there is no pixel array to sample
    * — the undecodable-input rule every stub stage here shares). */
  def resize(media: Dataset[MediaItem], outW: Int,
             outH: Int): Dataset[ResizedImage] = {
    // plan-time validation, frameSample-style: a non-positive grid is a
    // caller bug, not a per-row executor exception
    require(outW > 0 && outH > 0,
      s"output grid must be positive, got ${outW}x$outH")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.filter(_.bytes.nonEmpty).map { m =>
        val h = java.util.Arrays.hashCode(m.bytes)
        val inW = 16 + Math.floorMod(h, 1024)
        val inH = 16 + Math.floorMod(h >> 10, 1024)
        val n = m.bytes.length
        var s = 0L
        var r = 0
        while (r < outH) {
          val sr = r * inH / outH
          var c = 0
          while (c < outW) {
            val sc = c * inW / outW
            s += (m.bytes(((sr.toLong * inW + sc) % n).toInt) & 0xff)
            c += 1
          }
          r += 1
        }
        ResizedImage(m.doc_id, inW, inH, outW, outH, s)
      }
    }
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
