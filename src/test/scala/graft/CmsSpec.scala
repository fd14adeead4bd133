package graft

import graft.functions.{CmsBuffer, F}
import org.apache.spark.sql.functions._

/** Count-Min sketch family: exactness on small vocabularies,
  * never-undercount under forced collisions, the exact merge law,
  * serde across a real shuffle (the failure mode that burned the r6
  * HLL snapshot), and the SQL registration path. */
class CmsSpec extends SparkSpec {
  import spark.implicits._

  test("point estimates are exact on a collision-free vocabulary") {
    val df = Seq.fill(100)("a") ++ Seq.fill(37)("b") ++ Seq.fill(1)("c")
    val sk = df.toDF("k").agg(F.cmsSketch(col("k"), 4, 2048).as("sk"))
    val out = sk.select(
      F.cmsEstimate(col("sk"), lit("a")).as("a"),
      F.cmsEstimate(col("sk"), lit("b")).as("b"),
      F.cmsEstimate(col("sk"), lit("c")).as("c"),
      F.cmsEstimate(col("sk"), lit("zzz")).as("absent")).collect()(0)
    assert(out.getLong(0) == 100L)
    assert(out.getLong(1) == 37L)
    assert(out.getLong(2) == 1L)
    assert(out.getLong(3) == 0L)
  }

  test("never undercounts under forced collisions; estimate independent of partitioning") {
    // width 16 over 500 distinct longs: collisions guaranteed
    val keys = (0L until 2000L).map(i => i % 500L)
    val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def estimates(parts: Int): Map[Long, Long] = {
      val sk = keys.toDF("k").repartition(parts)
        .agg(F.cmsSketch(col("k"), 4, 16).as("sk"))
      (0L until 500L).toDF("probe")
        .crossJoin(broadcast(sk))
        .select(col("probe"), F.cmsEstimate(col("sk"), col("probe")).as("est"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val e1 = estimates(1)
    val e7 = estimates(7)
    exact.foreach { case (k, n) =>
      assert(e1(k) >= n, s"undercount at $k: ${e1(k)} < $n")
    }
    assert(e1 == e7, "estimate must not depend on partitioning")
  }

  test("union of per-group sketches equals the sketch of the union") {
    val df = (0L until 3000L).map(i => (i % 3, s"k${i % 17}")).toDF("g", "k")
    val viaUnion = df.groupBy(col("g")).agg(F.cmsSketch(col("k"), 4, 1024).as("sk"))
      .agg(F.cmsUnion(col("sk"), 4, 1024).as("sk"))
      .select(F.cmsEstimate(col("sk"), lit("k3")).as("e")).collect()(0).getLong(0)
    val direct = df.agg(F.cmsSketch(col("k"), 4, 1024).as("sk"))
      .select(F.cmsEstimate(col("sk"), lit("k3")).as("e")).collect()(0).getLong(0)
    assert(viaUnion == direct)
    assert(direct == 3000L / 17 + (if (3 < 3000 % 17) 1 else 0))
  }

  test("sketch survives serde across a real shuffle (grouped aggregation)") {
    val df = (0L until 5000L).map(i => (s"g${i % 8}", i % 100L)).toDF("g", "k")
      .repartition(6)
    val rows = df.groupBy(col("g")).agg(F.cmsSketch(col("k"), 4, 4096).as("sk"))
      .select(col("g"), F.cmsEstimate(col("sk"), lit(7L)).as("e"))
      .collect()
    assert(rows.length == 8)
    // i%100==7 and i%8==g solve (CRT, lcm 200) only for g=7 (i≡7 mod 200)
    // and g=3 (i≡107 mod 200): 25 hits each in [0,5000); other groups 0
    rows.foreach { r =>
      val expected = if (r.getString(0) == "g3" || r.getString(0) == "g7") 25L else 0L
      assert(r.getLong(1) == expected, s"${r.getString(0)}: ${r.getLong(1)}")
    }
  }

  test("SQL registration path: cms_sketch/cms_union/cms_estimate") {
    graft.functions.GraftFunctions.install(spark)
    Seq("x", "x", "y").toDF("k").createOrReplaceTempView("cms_in")
    val out = spark.sql(
      """SELECT cms_estimate(sk, 'x') AS ex, cms_estimate(sk, 'y') AS ey
        |FROM (SELECT cms_union(sk) AS sk FROM
        |  (SELECT cms_sketch(k) AS sk FROM cms_in GROUP BY k))""".stripMargin)
      .collect()(0)
    assert(out.getLong(0) == 2L && out.getLong(1) == 1L)
  }

  test("buffer serde round-trip and shape mismatch rejection") {
    val b = new CmsBuffer(3, 64)
    val (h1, h2) = CmsBuffer.hashPair(Long.box(42L))
    (1 to 5).foreach(_ => b.addHash(h1, h2))
    val back = CmsBuffer.deserialize(b.serialized)
    assert(back.depth == 3 && back.width == 64)
    assert(back.estimate(h1, h2) == 5L)
    val other = new CmsBuffer(4, 64)
    intercept[IllegalArgumentException](back.mergeFrom(other))
  }

  test("cms_union with default params adopts the stored sketches' shape (r8)") {
    // sketches stored at a NON-default 6x512; the fold declares nothing
    val daily = (0 until 4).map { d =>
      val keys = (0 until 50).map(i => s"k${(d * 7 + i) % 20}")
      keys -> d
    }
    val stored = daily.flatMap { case (ks, d) => ks.map(k => (d, k)) }
      .toDF("d", "k")
      .groupBy($"d").agg(F.cmsSketch($"k", 6, 512).as("sk"))
    val merged = stored.agg(F.cmsUnion($"sk").as("sk")) // default 4x2048 params
    val est = merged.select(F.cmsEstimate($"sk", lit("k0")).as("n")).collect()(0).getLong(0)
    val exact = daily.flatMap(_._1).count(_ == "k0").toLong
    assert(est == exact, s"adopted-shape fold must stay exact: est=$est exact=$exact")
    // the merged sketch carries the STORED shape, not the default
    val bytes = merged.collect()(0).getAs[Array[Byte]]("sk")
    val buf = CmsBuffer.deserialize(bytes)
    assert(buf.depth == 6 && buf.width == 512,
      s"expected adopted 6x512, got ${buf.depth}x${buf.width}")
  }

  test("genuinely mixed sketch shapes in one fold fail loudly (r8)") {
    val a = Seq("x", "y").toDF("k").agg(F.cmsSketch($"k", 4, 256).as("sk"))
    val b = Seq("x", "z").toDF("k").agg(F.cmsSketch($"k", 4, 512).as("sk"))
    val e = intercept[Exception] {
      a.union(b).coalesce(1).agg(F.cmsUnion($"sk").as("sk"))
        .select(F.cmsEstimate($"sk", lit("x"))).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => Option(c.getMessage).exists(_.contains("mixes sketch shapes"))),
      s"expected a clear mixed-shape error, got: $e")
  }
}
