package graft

import graft.multimodal.{Multimodal, StubCodecs}
import graft.operators.MultimodalQueries

/** Multimodal plumbing (SURVEY.md §2.11 E5): binary payloads + typed
  * metadata through Dataset encoders and batched mapPartitions
  * extraction. The codec layer is a deterministic stub; the plumbing
  * is real.
  */
class MultimodalSpec extends SparkSpec {

  test("synthesize: deterministic payloads with doc_id-predictable length") {
    val m1 = Multimodal.synthesize(spark, sf).collect().sortBy(_.media_id)
    val m2 = Multimodal.synthesize(spark, sf).collect().sortBy(_.media_id)
    assert(m1.length === 500)
    m1.zip(m2).foreach { case (a, b) =>
      assert(a.payload.toSeq === b.payload.toSeq, s"media ${a.media_id}")
    }
    m1.foreach { m =>
      assert(m.payload.length === (100 + m.media_id % 50).toInt)
      assert(Set("image", "audio", "video")(m.kind))
    }
  }

  test("extractFeatures: batched mapPartitions matches per-row stub decode") {
    val media = Multimodal.synthesize(spark, sf)
    val feats = Multimodal.extractFeatures(media, batchSize = 7)
      .collect().map(f => f.media_id -> f).toMap
    Multimodal.synthesize(spark, sf).collect().foreach { m =>
      val f = feats(m.media_id)
      assert(f.n_bytes === m.payload.length)
      assert(f.features.toSeq === StubCodecs.decodeFeatures(m.payload).toSeq)
    }
  }

  test("frameSample: frame grid matches duration metadata") {
    val media = Multimodal.synthesize(spark, sf).toDF()
    val metaById = Multimodal.synthesize(spark, sf).collect()
      .map(m => m.media_id -> m.meta.durationMs).toMap
    val frames = Multimodal.frameSample(media, everyMs = 1000).collect()
      .groupBy(_.getLong(0))
    frames.foreach { case (id, rows) =>
      val dur = metaById(id)
      assert(rows.length === dur / 1000 + 1)
      val ts = rows.map(_.getAs[Long]("frame_ts_ms")).sorted
      assert(ts.head === 0L && ts.last === (dur / 1000) * 1000L)
    }
  }

  test("mediaFeatures query: one row per media, feat_sum finite") {
    val rows = MultimodalQueries.mediaFeatures(spark, sf).collect()
    assert(rows.length === 500)
    rows.foreach(r => assert(!r.getAs[Double]("feat_sum").isNaN))
  }
}
