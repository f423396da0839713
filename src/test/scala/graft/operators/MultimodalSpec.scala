package graft.operators

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

  test("feature extraction is deterministic, batched and fixed-width") {
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    assert(f1.length == f2.length)
    f1.zip(f2).foreach { case (a, b) =>
      assert(a.features.toSeq == b.features.toSeq)
      assert(a.features.length == Multimodal.FeatureDim)
    }
    assert(f1.forall(_.payload_bytes == 128)) // 8 × md5
  }

  test("feature extraction preserves partitioning (no shuffle)") {
    val parts = media.rdd.getNumPartitions
    assert(Multimodal.extractFeatures(media).rdd.getNumPartitions == parts)
  }

  test("resize rewrites metadata only") {
    val r = Multimodal.resize(media, 224, 224).collect()
    assert(r.forall(m => m.width == 224 && m.height == 224))
  }

  test("frame sampling emits n evenly spaced frames per video") {
    val frames = Multimodal.sampleFrames(media, 4).collect()
    val videos = media.filter(_.media_type == "video").count()
    assert(frames.length == videos * 4)
    val byDoc = frames.groupBy(_.doc_id)
    byDoc.values.foreach { fs =>
      assert(fs.map(_.frame_idx).sorted.toSeq == Seq(0, 1, 2, 3))
      assert(fs.maxBy(_.frame_idx).frame_ms >= fs.minBy(_.frame_idx).frame_ms)
    }
  }

  test("mm_features query output shape") {
    val df = Multimodal.mmFeatures(spark, sf)
    assert(df.columns.toSeq ==
      Seq("doc_id", "media_type", "payload_bytes", "feature_sq_norm"))
    assert(df.count() > 0)
  }
}
