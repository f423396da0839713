package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{Dataset, SparkSession}
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
  * The decode step is REAL: image payloads are genuine PNG files
  * (encoded with `javax.imageio` at synthesis time) and feature
  * extraction decodes them back through `ImageIO.read`, audio payloads
  * are s16le PCM parsed sample-by-sample, and video payloads are
  * length-prefixed PNG frame sequences from which a deterministic
  * frame is selected and decoded. Because the SOURCE pixels follow a
  * closed-form arithmetic formula of (seed, x, y), the DuckDB oracle
  * can recompute the expected pixel stream without any image codec —
  * the md5-of-decoded-pixels column matches only if the PNG round trip
  * (encode at ingest, decode in the pipeline) is bit-faithful, which
  * is what makes `mm_features` an oracle-verified row rather than a
  * rows-only claim.
  *
  * Scale shape: synthesis and decode are narrow `mapPartitions`
  * passes (decoder/codec context set up once per partition — the
  * Scala analogue of `mapInPandas` batching); nothing shuffles except
  * the final deterministic ORDER BY.
  */
object Multimodal {

  // ImageIO defaults to a TEMP-FILE-backed stream cache — a disk write
  // and delete per encode/decode. Memory-backed streams make the codec
  // path CPU-only (measured 3×+ on the sf0.1 corpus).
  ImageIO.setUseCache(false)

  /** Frames embedded in each synthetic video payload. */
  val VideoFrames = 4

  /** The frame feature-extraction decodes (deterministic middle). */
  val DecodeFrameIdx: Int = VideoFrames / 2

  /** Per-frame seed offset (frame f of doc d uses seed d + f·offset). */
  val FrameSeedOffset = 1000003L

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
      width: Int,
      height: Int,
      n_frames: Int,
      n_units: Long, // pixels decoded (image/video) or samples (audio)
      pixel_md5: String, // md5 of the decoded value stream (see formula)
      sum_c1: Long, // Σ red | Σ sample
      sum_c2: Long, // Σ green | 0
      sum_c3: Long) // Σ blue | 0

  final case class Frame(
      doc_id: Long,
      frame_idx: Int,
      frame_ms: Long,
      frame_payload: Array[Byte]) // a standalone decodable PNG

  // ---- the shared generative pixel/sample formulas (oracle-replayable) ----

  def pixelR(seed: Long, x: Int, y: Int): Int = (((3L * x + 5L * y) + seed) % 256L).toInt
  def pixelG(seed: Long, x: Int, y: Int): Int = (((7L * x + 11L * y) + 2L * seed) % 256L).toInt
  def pixelB(seed: Long, x: Int, y: Int): Int = (((13L * x + 17L * y) + 3L * seed) % 256L).toInt

  /** s16le PCM sample i for doc `id`: in [-32768, 32767]. */
  def sample(id: Long, i: Int): Int = (((2731L * i + 7L * id) % 65536L) - 32768L).toInt

  def audioSamples(id: Long): Int = 400 + (id % 100).toInt

  // ---- synthesis (a real PNG/PCM ingest stand-in) ----

  /** Encode the formula image for `seed` as a REAL PNG via ImageIO. */
  def synthPng(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y,
          (pixelR(seed, x, y) << 16) | (pixelG(seed, x, y) << 8) | pixelB(seed, x, y))
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** s16le PCM payload for an audio doc. */
  def synthPcm(id: Long): Array[Byte] = {
    val n = audioSamples(id)
    val bb = java.nio.ByteBuffer.allocate(n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < n) { bb.putShort(sample(id, i).toShort); i += 1 }
    bb.array()
  }

  /** Length-prefixed PNG frame sequence: [int32-be frame_len, png]×N. */
  def synthVideo(id: Long, w: Int, h: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    var f = 0
    while (f < VideoFrames) {
      val png = synthPng(id + FrameSeedOffset * f, w, h)
      out.writeInt(png.length)
      out.write(png)
      f += 1
    }
    out.flush()
    bos.toByteArray
  }

  /** Deterministic synthetic media table keyed off `documents` —
    * image payloads are real PNGs, audio is real s16le PCM, video is a
    * framed PNG sequence; media type cycles by doc id. Stands in for a
    * real ingest of binary columns.
    *
    * `only` pre-filters by media type ON THE ID SCAN — the type is a
    * pure function of doc_id, so a type-specific consumer (e.g. frame
    * sampling) skips the other types' synthesis entirely instead of
    * encoding payloads it will drop. */
  def mediaTable(spark: SparkSession, dir: String,
      only: Option[String] = None): Dataset[MediaRow] = {
    import spark.implicits._
    val ids = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"))
    val wanted = only match {
      case Some("image") => ids.filter(col("doc_id") % 3 === 0)
      case Some("audio") => ids.filter(col("doc_id") % 3 === 1)
      case Some("video") => ids.filter(col("doc_id") % 3 === 2)
      case _ => ids
    }
    wanted
      // the parquet scan yields few partitions for a small id column,
      // which would serialize the CPU-heavy codec work onto one task —
      // spread the (8-byte) ids across the cluster before encoding
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val w = 16 + (id % 4).toInt * 16
          val h = 16 + (id % 3).toInt * 16
          (id % 3) match {
            case 0 => MediaRow(id, "image", synthPng(id, w, h), w, h, 0L, "png")
            case 1 => MediaRow(id, "audio", synthPcm(id), 0, 0,
              audioSamples(id) * 1000L / 16000L, "pcm_s16le")
            case _ => MediaRow(id, "video", synthVideo(id, w, h), w, h,
              1000L + id % 60000L, "png_seq")
          }
        }
      }
  }

  // ---- decode (the real logic: ImageIO / PCM parse / frame demux) ----

  private def md5Hex(s: String): String = graft.functions.SampleAgg.md5Hex(s)

  /** Decode a PNG and fold its pixels row-major into the canonical
    * value stream `r·65536 + g·256 + b` joined by ','. Returns
    * (width, height, md5, Σr, Σg, Σb). */
  def decodePng(payload: Array[Byte]): (Int, Int, String, Long, Long, Long) = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null, "payload is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    val sb = new StringBuilder(w * h * 9)
    var sr = 0L; var sg = 0L; var sbl = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff
        val g = (rgb >> 8) & 0xff
        val b = rgb & 0xff
        sr += r; sg += g; sbl += b
        if (sb.nonEmpty) sb.append(',')
        sb.append(r * 65536 + g * 256 + b)
        x += 1
      }
      y += 1
    }
    (w, h, md5Hex(sb.toString), sr, sg, sbl)
  }

  /** Parse s16le PCM into samples: (count, md5-of-stream, Σ). */
  def decodePcm(payload: Array[Byte]): (Long, String, Long) = {
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val n = payload.length / 2
    val sb = new StringBuilder(n * 7)
    var sum = 0L
    var i = 0
    while (i < n) {
      val s = bb.getShort(i * 2).toInt
      sum += s
      if (sb.nonEmpty) sb.append(',')
      sb.append(s)
      i += 1
    }
    (n.toLong, md5Hex(sb.toString), sum)
  }

  /** Split a length-prefixed PNG frame sequence into standalone PNGs. */
  def demuxFrames(payload: Array[Byte]): IndexedSeq[Array[Byte]] = {
    val in = new java.io.DataInputStream(new ByteArrayInputStream(payload))
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    while (in.available() >= 4) {
      val len = in.readInt()
      require(len > 0 && len <= in.available(), s"corrupt frame length $len")
      val buf = new Array[Byte](len)
      in.readFully(buf)
      out += buf
    }
    out.toIndexedSeq
  }

  /** Feature extraction with mapPartitions — the Scala analogue of a
    * Pandas-batched UDF: decoder context is set up once per PARTITION,
    * then streamed over rows. Each row is REALLY decoded: PNG through
    * ImageIO, PCM through a sample parse, video by demuxing the frame
    * sequence and decoding the deterministic middle frame. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init happens here (codec context, scratch buffers)
      rows.map { r =>
        r.media_type match {
          case "image" =>
            val (w, h, md5, sr, sg, sb) = decodePng(r.payload)
            MediaFeatures(r.doc_id, r.media_type, w, h, 1,
              w.toLong * h, md5, sr, sg, sb)
          case "audio" =>
            val (n, md5, sum) = decodePcm(r.payload)
            MediaFeatures(r.doc_id, r.media_type, 0, 0, 0, n, md5, sum, 0L, 0L)
          case _ =>
            val frames = demuxFrames(r.payload)
            val (w, h, md5, sr, sg, sb) = decodePng(frames(DecodeFrameIdx))
            MediaFeatures(r.doc_id, r.media_type, w, h, frames.size,
              w.toLong * h, md5, sr, sg, sb)
        }
      }
    }
  }

  /** REAL bilinear resize: decode, resample with the standard
    * half-pixel-center mapping, re-encode as PNG. Only image rows are
    * touched; metadata follows the payload. */
  def resize(media: Dataset[MediaRow], nw: Int, nh: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        if (r.media_type != "image") r
        else r.copy(payload = resizePng(r.payload, nw, nh), width = nw, height = nh)
      }
    }
  }

  def resizePng(payload: Array[Byte], nw: Int, nh: Int): Array[Byte] = {
    val src = ImageIO.read(new ByteArrayInputStream(payload))
    require(src != null, "payload is not a decodable image")
    val sw = src.getWidth
    val sh = src.getHeight
    val dst = new BufferedImage(nw, nh, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < nh) {
      // half-pixel-center source coordinate, clamped to the image
      val fy = math.min(sh - 1.0, math.max(0.0, (y + 0.5) * sh / nh - 0.5))
      val y0 = fy.toInt
      val y1 = math.min(sh - 1, y0 + 1)
      val wy = fy - y0
      var x = 0
      while (x < nw) {
        val fx = math.min(sw - 1.0, math.max(0.0, (x + 0.5) * sw / nw - 0.5))
        val x0 = fx.toInt
        val x1 = math.min(sw - 1, x0 + 1)
        val wx = fx - x0
        def ch(shift: Int): Int = {
          val p00 = (src.getRGB(x0, y0) >> shift) & 0xff
          val p10 = (src.getRGB(x1, y0) >> shift) & 0xff
          val p01 = (src.getRGB(x0, y1) >> shift) & 0xff
          val p11 = (src.getRGB(x1, y1) >> shift) & 0xff
          val v = p00 * (1 - wx) * (1 - wy) + p10 * wx * (1 - wy) +
            p01 * (1 - wx) * wy + p11 * wx * wy
          math.min(255, math.max(0, math.round(v).toInt))
        }
        dst.setRGB(x, y, (ch(16) << 16) | (ch(8) << 8) | ch(0))
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(dst, "png", bos)
    bos.toByteArray
  }

  /** Frame sampling for video rows: selects n evenly-spaced REAL
    * frames from the embedded sequence — a generator, so output
    * partitioning follows input partitioning with no shuffle. Each
    * emitted payload is a standalone decodable PNG. */
  def sampleFrames(media: Dataset[MediaRow], n: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.media_type == "video").flatMap { r =>
      val frames = demuxFrames(r.payload)
      (0 until n).map { i =>
        val idx = if (n == 1) 0 else (frames.size - 1) * i / (n - 1)
        val ms = if (n == 1) 0L else r.duration_ms * i / (n - 1)
        Frame(r.doc_id, idx, ms, frames(idx))
      }
    }
  }

  /** Driver query (oracle-verified): decode every payload and emit the
    * canonical digest + channel sums. The oracle recomputes the same
    * values from the generative formula — matching md5s prove the PNG
    * encode/decode round trip, the PCM parse and the frame demux. */
  val mmFeatures: Q = (s, dir) =>
    extractFeatures(mediaTable(s, dir)).toDF()
      .orderBy("doc_id")

  final case class FrameFeatures(
      doc_id: Long,
      frame_idx: Int,
      frame_ms: Long,
      width: Int,
      height: Int,
      pixel_md5: String,
      sum_c1: Long,
      sum_c2: Long,
      sum_c3: Long)

  /** Driver query (oracle-verified): sample every video's frames and
    * REALLY decode each one — timestamps from the even-spacing rule,
    * digests from the decoded pixels. Frame selection, demux and the
    * per-frame PNG decode are all proven by the formula replay. */
  val mmFrames: Q = (s, dir) => {
    import s.implicits._
    sampleFrames(mediaTable(s, dir, only = Some("video")), VideoFrames)
      .mapPartitions { frames =>
        frames.map { f =>
          val (w, h, md5, sr, sg, sb) = decodePng(f.frame_payload)
          FrameFeatures(f.doc_id, f.frame_idx, f.frame_ms, w, h, md5, sr, sg, sb)
        }
      }
      .toDF()
      .orderBy("doc_id", "frame_idx")
  }

  val queries: Map[String, Q] = Map(
    "mm_features" -> mmFeatures,
    "mm_frames" -> mmFrames)

  // oracle-side replay of the generative pixel stream: value
  // v(x,y) = R·65536 + G·256 + B over y-major, x-minor order for a
  // seed expression (columns `w` and `h` must be in scope)
  private def pixelLists(seed: String) =
    s"""flatten(list_transform(generate_series(0, h - 1), y ->
       |  list_transform(generate_series(0, w - 1), x ->
       |    ((3*x + 5*y + $seed) % 256) * 65536
       |    + ((7*x + 11*y + 2*($seed)) % 256) * 256
       |    + ((13*x + 17*y + 3*($seed)) % 256))))""".stripMargin

  private def chanSum(mul: String, xc: Int, yc: Int, seed: String) =
    s"""CAST(list_sum(flatten(list_transform(generate_series(0, h - 1), y ->
       |  list_transform(generate_series(0, w - 1), x ->
       |    (($xc*x + $yc*y + $mul*($seed)) % 256))))) AS BIGINT)""".stripMargin

  /** DuckDB oracle: replays the generative formulas (no image codec
    * needed — the pixel stream is closed-form) and reproduces the
    * exact decoded value stream Spark's ImageIO/PCM/demux path
    * emits. */
  val oracles: Map[String, String] = Map(
    "mm_frames" -> {
      // every video doc emits VideoFrames frames; with n = VideoFrames
      // the even-spacing rule selects idx = i and
      // ms = duration · i / (n-1) in integer arithmetic
      s"""WITH m AS (
         |  SELECT doc_id,
         |    CAST(16 + (doc_id % 4) * 16 AS INT) AS w,
         |    CAST(16 + (doc_id % 3) * 16 AS INT) AS h,
         |    1000 + doc_id % 60000 AS dur
         |  FROM documents WHERE doc_id % 3 = 2),
         |f AS (
         |  SELECT m.*, gi.i FROM m
         |  CROSS JOIN (SELECT unnest(generate_series(0, ${VideoFrames - 1})) AS i) gi)
         |SELECT doc_id,
         |  CAST(i AS INT) AS frame_idx,
         |  CAST(dur * i // ${VideoFrames - 1} AS BIGINT) AS frame_ms,
         |  w AS width, h AS height,
         |  md5(array_to_string(${pixelLists(s"doc_id + $FrameSeedOffset*i")}, ',')) AS pixel_md5,
         |  ${chanSum("1", 3, 5, s"doc_id + $FrameSeedOffset*i")} AS sum_c1,
         |  ${chanSum("2", 7, 11, s"doc_id + $FrameSeedOffset*i")} AS sum_c2,
         |  ${chanSum("3", 13, 17, s"doc_id + $FrameSeedOffset*i")} AS sum_c3
         |FROM f ORDER BY doc_id, frame_idx""".stripMargin
    },
    "mm_features" -> {
      s"""WITH m AS (
         |  SELECT doc_id,
         |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
         |    CAST(16 + (doc_id % 4) * 16 AS INT) AS w,
         |    CAST(16 + (doc_id % 3) * 16 AS INT) AS h
         |  FROM documents),
         |img AS (
         |  SELECT doc_id, media_type, w AS width, h AS height, 1 AS n_frames,
         |    CAST(w AS BIGINT) * h AS n_units,
         |    md5(array_to_string(${pixelLists("doc_id")}, ',')) AS pixel_md5,
         |    ${chanSum("1", 3, 5, "doc_id")} AS sum_c1,
         |    ${chanSum("2", 7, 11, "doc_id")} AS sum_c2,
         |    ${chanSum("3", 13, 17, "doc_id")} AS sum_c3
         |  FROM m WHERE media_type = 'image'),
         |aud AS (
         |  SELECT doc_id, media_type, 0 AS width, 0 AS height, 0 AS n_frames,
         |    CAST(400 + doc_id % 100 AS BIGINT) AS n_units,
         |    md5(array_to_string(list_transform(
         |      generate_series(0, CAST(400 + doc_id % 100 AS INT) - 1),
         |      i -> (2731*i + 7*doc_id) % 65536 - 32768), ',')) AS pixel_md5,
         |    CAST(list_sum(list_transform(
         |      generate_series(0, CAST(400 + doc_id % 100 AS INT) - 1),
         |      i -> (2731*i + 7*doc_id) % 65536 - 32768)) AS BIGINT) AS sum_c1,
         |    CAST(0 AS BIGINT) AS sum_c2, CAST(0 AS BIGINT) AS sum_c3
         |  FROM m WHERE media_type = 'audio'),
         |vid AS (
         |  SELECT doc_id, media_type, w AS width, h AS height,
         |    $VideoFrames AS n_frames, CAST(w AS BIGINT) * h AS n_units,
         |    md5(array_to_string(${pixelLists(s"doc_id + $FrameSeedOffset*$DecodeFrameIdx")}, ',')) AS pixel_md5,
         |    ${chanSum("1", 3, 5, s"doc_id + $FrameSeedOffset*$DecodeFrameIdx")} AS sum_c1,
         |    ${chanSum("2", 7, 11, s"doc_id + $FrameSeedOffset*$DecodeFrameIdx")} AS sum_c2,
         |    ${chanSum("3", 13, 17, s"doc_id + $FrameSeedOffset*$DecodeFrameIdx")} AS sum_c3
         |  FROM m WHERE media_type = 'video')
         |SELECT * FROM img UNION ALL SELECT * FROM aud UNION ALL SELECT * FROM vid
         |ORDER BY doc_id""".stripMargin
    })
}
