package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads ride as opaque binary
  * columns with typed metadata; decode/feature-extract runs
  * partition-wise in batches (the Scala analogue of mapInPandas).
  *
  * The decode step is STUBBED — media codecs are not available in this
  * container — with a deterministic fake (byte-sum + length features).
  * Everything around it (schema, encoders, partitioning, batch
  * iteration) is the real production shape: swap `decodeStub` for a
  * codec call and nothing else changes.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte], meta_lang: String)
  case class MediaFeatures(
      doc_id: Long, n_bytes: Int, byte_sum: Long,
      stub_width: Int, stub_height: Int, meta_lang: String)

  /** Wrap documents as a media table: binary payload + metadata. */
  def asMediaTable(documents: DataFrame): Dataset[MediaRow] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      .select(col("doc_id"),
        encode(col("text"), "utf-8").as("payload"),
        col("lang").as("meta_lang"))
      .as[MediaRow]
  }

  /** STUB decode: deterministic features from the raw bytes. A real
    * deployment decodes the image/audio here (one codec init per
    * partition, amortized over the batch — that is why this is
    * mapPartitions and not a per-row UDF). */
  private def decodeStub(payload: Array[Byte]): (Long, Int, Int) = {
    var s = 0L
    var i = 0
    while (i < payload.length) { s += payload(i) & 0xff; i += 1 }
    (s, (payload.length % 640), (payload.length % 480))
  }

  /** Partition-wise feature extraction over the binary payloads. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition init would go here (codec/model handle)
      rows.map { r =>
        val (sum, w, h) = decodeStub(r.payload)
        MediaFeatures(r.doc_id, r.payload.length, sum, w, h, r.meta_lang)
      }
    }
  }

  /** Resize stub: deterministic byte-stride downsample to at most
    * `maxBytes` (a real deployment decodes, scales, re-encodes here —
    * the 1-in/1-out partition-wise shape is identical). */
  def resize(media: Dataset[MediaRow], maxBytes: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val p = r.payload
        val stride = math.max(1, p.length / math.max(1, maxBytes))
        val out = p.indices.by(stride).map(p).toArray
        r.copy(payload = out)
      }
    }
  }

  case class MediaFrame(
      doc_id: Long, frame_id: Int, payload: Array[Byte], meta_lang: String)

  /** Frame-sample stub: one row in, `nFrames` rows out — equal byte
    * slices standing in for decoded video frames. The flatMap shape
    * (fan-out inside the partition, no shuffle) is the production
    * shape for frame extraction at corpus scale. */
  def sampleFrames(
      media: Dataset[MediaRow], nFrames: Int): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      val p = r.payload
      val n = math.max(1, math.min(nFrames, p.length))
      val step = math.max(1, p.length / n)
      (0 until n).map { f =>
        val from = f * step
        val until = math.min(p.length, from + step)
        MediaFrame(r.doc_id, f, java.util.Arrays.copyOfRange(p, from, until),
          r.meta_lang)
      }
    }
  }
}
