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

  test("dedup corpus: payloads byte-equal IFF same (g, v) class — the oracle contract") {
    import org.apache.spark.sql.functions.col
    val rows = Multimodal.synthesizeDedupCorpus(spark, sf)
      .select(col("media_id"), col("payload")).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    assert(rows.length === 500)
    rows.foreach { case (_, p) => assert(p.length === 121) }
    def clazz(id: Long) = (id % 17, (id / 17) % 3)
    val byClass = rows.groupBy { case (id, _) => clazz(id) }
    // within a class: exact byte duplicates
    byClass.values.foreach { members =>
      val first = members.head._2.toSeq
      members.foreach { case (id, p) =>
        assert(p.toSeq === first, s"media $id diverges from its class")
      }
    }
    // across classes: byte-distinct (the tail class byte guarantees it)
    val reps = byClass.map { case (c, ms) => c -> ms.head._2.toSeq }
    reps.toSeq.combinations(2).foreach { case Seq((c1, p1), (c2, p2)) =>
      assert(p1 !== p2, s"classes $c1 and $c2 collide")
    }
  }

  test("mediaDedup matches a driver-side byte-grain groupBy") {
    import org.apache.spark.sql.functions.col
    val rows = Multimodal.synthesizeDedupCorpus(spark, sf)
      .select(col("media_id"), col("payload")).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq))
    val expected = rows.groupBy(_._2).values
      .map(ms => (ms.map(_._1).min, ms.size.toLong)).toSet
    val got = MultimodalQueries.mediaDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
    assert(got.exists(_._2 > 1), "dedup corpus should contain exact duplicates")
  }

  test("dHash: engine column matches driver recompute; <=6 bits within group, far across") {
    import org.apache.spark.sql.functions.col
    val withH = Multimodal.synthesizeDedupCorpus(spark, sf)
      .select(col("media_id"), col("payload"),
        Multimodal.dhash64("payload").as("dh")).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1), r.getLong(2)))
    def refDhash(p: Array[Byte]): Long = {
      var acc = 0L
      for (i <- 0 until 64) {
        val pos = (i / 8) * 9 + (i % 8)
        val bit = if ((p(pos) & 0xFF) > (p(pos + 1) & 0xFF)) 1L else 0L
        acc = (acc << 1) | bit
      }
      acc
    }
    withH.foreach { case (id, p, dh) =>
      assert(dh === refDhash(p), s"media $id dhash mismatch")
    }
    val byGroup = withH.groupBy { case (id, _, _) => id % 17 }
    byGroup.values.foreach { ms =>
      ms.combinations(2).foreach { case Array((a, _, da), (b, _, db)) =>
        val d = java.lang.Long.bitCount(da ^ db)
        assert(d <= 6, s"within-group pair ($a,$b) at Hamming $d")
      }
    }
    // cross-group rep pairs: far apart (precision's structural basis)
    val reps = byGroup.map { case (g, ms) => (g, ms.head._3) }.toSeq
    reps.combinations(2).foreach { case Seq((g1, d1), (g2, d2)) =>
      val d = java.lang.Long.bitCount(d1 ^ d2)
      assert(d > 6, s"groups $g1/$g2 at Hamming $d — synthesis regression")
    }
  }

  test("mediaNearDup: gated output = same-group truth with both claims true") {
    val rows = MultimodalQueries.mediaNearDup(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("recall_ok"))
      assert(r.getAs[Boolean]("precision_ok"))
      assert(r.getLong(0) % 17 === r.getLong(1) % 17)
    }
  }
}
