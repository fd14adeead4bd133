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

  test("feature-sum exactness: float bins sum to sum(bytes)/256 with zero drift") {
    // the oracle contract behind q_media_features' hash gate: /256
    // dyadic scaling makes every float accumulation exact, so the
    // double feat_sum equals integer-sum(bytes)/256 for ANY id/len —
    // not just the fixture's
    val rnd = new scala.util.Random(7)
    (1 to 500).foreach { _ =>
      val id = rnd.nextLong() & Long.MaxValue
      val len = 1 + rnd.nextInt(300)
      val p = StubCodecs.keystream(id, len)
      val exact = p.map(b => (b & 0xFF).toLong).sum.toDouble / 256.0
      val got = StubCodecs.decodeFeatures(p).map(_.toDouble).sum
      assert(got === exact, s"id=$id len=$len")
    }
  }

  test("mediaFeatures query: one row per media, feat_sum finite") {
    val rows = MultimodalQueries.mediaFeatures(spark, sf).collect()
    assert(rows.length === 500)
    rows.foreach(r => assert(!r.getAs[Double]("feat_sum").isNaN))
  }
}
