package graft.operators

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.mediaTable(spark, sf)

  test("media table schema: binary payload + typed metadata") {
    val schema = media.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("width").dataType.typeName == "integer")
    assert(media.count() > 0)
    // metadata predicates select without touching payloads
    val images = media.filter(_.media_type == "image")
    assert(images.count() > 0)
  }

  test("image payloads are real PNGs whose decoded dims match metadata") {
    val imgs = media.filter(_.media_type == "image").collect()
    assert(imgs.nonEmpty)
    imgs.foreach { m =>
      // PNG signature
      assert((m.payload(0) & 0xff) == 0x89 && m.payload(1) == 'P')
      val decoded = ImageIO.read(new ByteArrayInputStream(m.payload))
      assert(decoded != null)
      assert(decoded.getWidth == m.width)
      assert(decoded.getHeight == m.height)
      // corner pixel equals the generative formula — decode is faithful
      val rgb = decoded.getRGB(0, 0)
      assert(((rgb >> 16) & 0xff) == Multimodal.pixelR(m.doc_id, 0, 0))
      assert(((rgb >> 8) & 0xff) == Multimodal.pixelG(m.doc_id, 0, 0))
      assert((rgb & 0xff) == Multimodal.pixelB(m.doc_id, 0, 0))
    }
  }

  test("feature extraction really decodes: md5 equals a from-formula replay") {
    val feats = Multimodal.extractFeatures(media).collect()
    val byId = feats.map(f => f.doc_id -> f).toMap
    // replay one image doc's expected stream straight from the formula
    val img = media.filter(_.media_type == "image").head()
    val expected = {
      val sb = new StringBuilder
      for (y <- 0 until img.height; x <- 0 until img.width) {
        if (sb.nonEmpty) sb.append(',')
        sb.append(Multimodal.pixelR(img.doc_id, x, y) * 65536 +
          Multimodal.pixelG(img.doc_id, x, y) * 256 +
          Multimodal.pixelB(img.doc_id, x, y))
      }
      graft.functions.SampleAgg.md5Hex(sb.toString)
    }
    assert(byId(img.doc_id).pixel_md5 == expected)
    // audio: sum of samples matches the formula
    val aud = media.filter(_.media_type == "audio").head()
    val n = Multimodal.audioSamples(aud.doc_id)
    assert(byId(aud.doc_id).n_units == n)
    assert(byId(aud.doc_id).sum_c1 ==
      (0 until n).map(i => Multimodal.sample(aud.doc_id, i).toLong).sum)
    // video: frame count and the middle-frame digest differ from frame 0's
    val vid = media.filter(_.media_type == "video").head()
    assert(byId(vid.doc_id).n_frames == Multimodal.VideoFrames)
  }

  test("feature extraction preserves partitioning (no shuffle)") {
    val parts = media.rdd.getNumPartitions
    assert(Multimodal.extractFeatures(media).rdd.getNumPartitions == parts)
  }

  test("resize really resamples: decoded dims change, bilinear values hold") {
    val r = Multimodal.resize(media, 24, 24)
      .filter(_.media_type == "image").collect()
    assert(r.nonEmpty)
    r.foreach { m =>
      assert(m.width == 24 && m.height == 24)
      val img = ImageIO.read(new ByteArrayInputStream(m.payload))
      assert(img.getWidth == 24 && img.getHeight == 24)
    }
    // a constant-color image resizes to the same constant color
    val flat = {
      val src = new java.awt.image.BufferedImage(
        16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16) src.setRGB(x, y, 0x336699)
      val bos = new java.io.ByteArrayOutputStream()
      ImageIO.write(src, "png", bos)
      bos.toByteArray
    }
    val resized = ImageIO.read(
      new ByteArrayInputStream(Multimodal.resizePng(flat, 7, 9)))
    for (y <- 0 until 9; x <- 0 until 7)
      assert((resized.getRGB(x, y) & 0xffffff) == 0x336699)
  }

  test("frame sampling emits n evenly spaced decodable frames per video") {
    val frames = Multimodal.sampleFrames(media, 4).collect()
    val videos = media.filter(_.media_type == "video").count()
    assert(frames.length == videos * 4)
    val byDoc = frames.groupBy(_.doc_id)
    byDoc.values.foreach { fs =>
      assert(fs.map(_.frame_idx).sorted.toSeq == Seq(0, 1, 2, 3))
      assert(fs.maxBy(_.frame_idx).frame_ms >= fs.minBy(_.frame_idx).frame_ms)
    }
    // each emitted frame payload is a standalone decodable PNG, and
    // frame f's corner pixel follows the per-frame seed
    val f = frames.find(_.frame_idx == 1).get
    val img = ImageIO.read(new ByteArrayInputStream(f.frame_payload))
    assert(img != null)
    val seed = f.doc_id + Multimodal.FrameSeedOffset * 1
    assert(((img.getRGB(0, 0) >> 16) & 0xff) == Multimodal.pixelR(seed, 0, 0))
  }

  test("mm_features query output shape") {
    val df = Multimodal.mmFeatures(spark, sf)
    assert(df.columns.toSeq == Seq("doc_id", "media_type", "width", "height",
      "n_frames", "n_units", "pixel_md5", "sum_c1", "sum_c2", "sum_c3"))
    assert(df.count() > 0)
  }
}
