package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q

/** Multimodal columns for training-data pipelines (SURVEY §2 D12).
  *
  * Media payloads are opaque `binary` columns with a typed metadata
  * struct — the layout that lets 100 TB of images ride in parquet next
  * to their features, with metadata predicates (type, dims, codec)
  * pushed to the scan while payload bytes are only deserialized in the
  * partitions that need them.
  *
  * The decode step is a STUB: the real image/audio libs are not in this
  * container, so `decodeStub` derives deterministic fake pixel
  * statistics from the payload bytes. Everything AROUND the stub — the
  * schema, the per-partition batch iteration (the Scala analogue of
  * `mapInPandas`: one iterator pass per partition, no per-row setup
  * cost), partition counts, and the feature-vector shape — is real and
  * tested by MultimodalSpec.
  */
object Multimodal {

  val FeatureDim = 16

  final case class MediaRow(
      doc_id: Long,
      media_type: String, // image | audio | video
      payload: Array[Byte],
      width: Int,
      height: Int,
      duration_ms: Long,
      codec: String)

  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      payload_bytes: Int,
      features: Array[Float])

  final case class Frame(
      doc_id: Long,
      frame_idx: Int,
      frame_ms: Long,
      frame_payload: Array[Byte])

  /** Deterministic synthetic media table derived from `documents` —
    * payload bytes are a repeatable function of the text, media type
    * cycles by doc id. Stands in for a real ingest of binary columns. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val payload = java.security.MessageDigest.getInstance("MD5")
          .digest(text.getBytes("UTF-8"))
        val mt = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        MediaRow(id, mt, Array.fill(8)(payload).flatten,
          width = 16 + (id % 4).toInt * 16,
          height = 16 + (id % 3).toInt * 16,
          duration_ms = if (mt == "image") 0 else 1000 + id % 60000,
          codec = mt match {
            case "image" => "png"; case "audio" => "pcm"; case _ => "h264"
          })
      }
  }

  /** STUB decode: deterministic per-byte statistics standing in for
    * pixel decoding. Signature and batching are the real contract. */
  private def decodeStub(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    var i = 0
    while (i < payload.length) {
      out(i % FeatureDim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Feature extraction with mapPartitions — the Scala analogue of a
    * Pandas-batched UDF: the (expensive, in real life) decoder context
    * is set up once per PARTITION, then streamed over rows. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init happens here (model load / codec context)
      rows.map { r =>
        MediaFeatures(r.doc_id, r.media_type, r.payload.length,
          decodeStub(r.payload))
      }
    }
  }

  /** STUB resize: metadata transform + payload passthrough; a real
    * implementation swaps only the payload function. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map(r => r.copy(width = w, height = h))
  }

  /** Frame sampling for video rows: emits n evenly-spaced (stub)
    * frames per video — a generator, so output partitioning follows
    * input partitioning with no shuffle. */
  def sampleFrames(media: Dataset[MediaRow], n: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.media_type == "video").flatMap { r =>
      (0 until n).map { i =>
        val ms = if (n == 1) 0L else r.duration_ms * i / (n - 1)
        Frame(r.doc_id, i, ms, r.payload.take(16))
      }
    }
  }

  /** Driver query (rows-only): per-type feature summary — proves the
    * whole binary-column pipeline runs distributed. */
  val mmFeatures: Q = (s, dir) => {
    import s.implicits._
    extractFeatures(mediaTable(s, dir)).toDF()
      .select(col("doc_id"), col("media_type"), col("payload_bytes"),
        round(aggregate(col("features"),
          lit(0.0), (a, x) => a + x * x), 4).as("feature_sq_norm"))
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map("mm_features" -> mmFeatures)
  val oracles: Map[String, String] = Map.empty
}
