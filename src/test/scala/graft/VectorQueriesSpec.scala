package graft

import graft.operators.VectorQueries

/** Vector similarity family (SURVEY.md §2.11 E3): brute-force checked
  * against a driver-side cosine recomputation; LSH checked as a
  * subset/recall property of brute force (its hash-derived hyperplanes
  * have no SQL oracle).
  */
class VectorQueriesSpec extends SparkSpec {

  private lazy val vecs: Map[Long, Array[Double]] =
    Tables.load(spark, sf, "embeddings").select("vec_id", "embedding")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  test("knnBrute matches driver-side top-10 by cosine") {
    val qId = vecs.keys.min
    val qv = vecs(qId)
    val exp = vecs.toSeq.filter(_._1 != qId)
      .map { case (id, v) => (id, math.rint(cos(qv, v) * 1e4) / 1e4) }
      .sortBy { case (id, c) => (-c, id) }.take(10)
    val got = VectorQueries.knnBrute(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === exp)
  }

  test("vecNorms: per-label counts sum to corpus, norms positive") {
    val rows = VectorQueries.vecNorms(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n")).sum === vecs.size)
    rows.foreach(r => assert(r.getAs[Double]("avg_norm") > 0.0))
  }

  test("cosineDedup: all pairs >= 0.3, values match driver recomputation") {
    val rows = VectorQueries.cosineDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    rows.foreach { case (a, b, c) =>
      assert(a < b)
      assert(c >= 0.3)
      val expected = math.rint(cos(vecs(a), vecs(b)) * 1e4) / 1e4
      assert(math.abs(c - expected) < 1e-9, s"pair ($a,$b): $c vs $expected")
    }
  }

  test("cosineDedupLsh: probe finds true pairs; gated output = exact pairs + recall_ok") {
    val allPairs = vecs.toSeq.combinations(2).collect {
      case Seq((a, va), (b, vb)) if cos(va, vb) >= 0.3 =>
        (math.min(a, b), math.max(a, b))
    }.toSet
    // the PROBE (the real LSH funnel): true scores, subset of the
    // all-pairs >= 0.3 set, measured recall above the claim floor (the
    // r8 single-table variant measured 0.15 and would fail here)
    val (probeDf, recall) = VectorQueries.cosineDedupLshFound(spark, sf)
    assert(recall >= 0.8, s"probe recall $recall below floor")
    val got = probeDf.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    got.foreach { case (a, b, c) =>
      assert(a < b && allPairs.contains((a, b)), s"($a,$b) not a true near-dup")
      val expected = math.rint(cos(vecs(a), vecs(b)) * 1e4) / 1e4
      assert(math.abs(c - expected) < 1e-9)
    }
    // the GATED oracle form (r11): emits exactly the exact
    // label-blocked pair set (the q_cosine_dedup twin) + recall_ok
    val gated = VectorQueries.cosineDedupLsh(spark, sf).collect()
    gated.foreach(r => assert(r.getAs[Boolean]("recall_ok")))
    gated.foreach(r => assert(r.getAs[Boolean]("precision_ok")))
    val exact = VectorQueries.cosineDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(gated.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq === exact)
  }

  test("semDedup: cluster-blocked probe finds true pairs; soft top-k beats hard argmax; gated output = exact pairs + recall_ok") {
    val allPairs = vecs.toSeq.combinations(2).collect {
      case Seq((a, va), (b, vb)) if cos(va, vb) >= 0.3 =>
        (math.min(a, b), math.max(a, b))
    }.toSet
    // the PROBE (k-means cluster blocking, top-8 soft assignment —
    // r13 default): true scores, subset of the all-pairs >= 0.3 set,
    // measured recall above the claim floor
    val (probeDf, recall) = VectorQueries.semDedupFound(spark, sf)
    assert(recall >= 0.7, s"probe recall $recall below floor")
    val got = probeDf.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    got.foreach { case (a, b, c) =>
      assert(a < b && allPairs.contains((a, b)), s"($a,$b) not a true near-dup")
      val expected = math.rint(cos(vecs(a), vecs(b)) * 1e4) / 1e4
      assert(math.abs(c - expected) < 1e-9)
    }
    // soft assignment is the point: hard argmax (probes=1) drops the
    // cluster-boundary pairs, so its recall must not exceed top-k's
    val (_, hardRecall) = VectorQueries.semDedupFound(spark, sf, probes = 1)
    assert(hardRecall <= recall,
      s"hard-argmax recall $hardRecall above soft top-k recall $recall")
    // the GATED oracle form: emits exactly the exact label-blocked
    // pair set (the q_cosine_dedup twin) + recall_ok
    val gated = VectorQueries.semDedup(spark, sf).collect()
    gated.foreach(r => assert(r.getAs[Boolean]("recall_ok")))
    gated.foreach(r => assert(r.getAs[Boolean]("precision_ok")))
    val exact = VectorQueries.cosineDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(gated.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq === exact)
  }

  test("semDedupIncremental: memoized index, per-item O(new) probe, gated output = exact cross truth") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    // (a) the corpus-side index is a memoized artifact: a second call
    // returns the SAME checkpointed DataFrame instance — per-ingest
    // work cannot include an index rebuild
    val idx1 = VectorQueries.semDedupIndex(spark, sf)
    val idx2 = VectorQueries.semDedupIndex(spark, sf)
    assert(idx1 eq idx2, "index rebuilt on second call — memo broken")
    // (b) per-item independence (the O(new) semantics): probing a
    // SUB-batch yields exactly the full probe's pairs restricted to it
    val full = emb().where(pmod(col("vec_id"), lit(2)) === 1)
    val fullPairs = VectorQueries
      .semDedupIncrementalFound(spark, sf, full).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cut = vecs.keys.filter(_ % 2 == 1).toSeq.sorted
      .apply(vecs.keys.count(_ % 2 == 1) / 2)
    val subPairs = VectorQueries
      .semDedupIncrementalFound(spark, sf, full.where(col("vec_id") <= cut))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(subPairs === fullPairs.filter(_._2 <= cut),
      "sub-batch probe diverged from the restricted full probe")
    // (c) every found pair is a true >= 0.3 cross-parity pair
    fullPairs.foreach { case (c0, b0) =>
      assert(c0 % 2 == 0 && b0 % 2 == 1)
      assert(cos(vecs(c0), vecs(b0)) >= 0.3, s"($c0,$b0) below threshold")
    }
    // (d) the gated oracle form: exact label-blocked cross truth +
    // claims fixed true
    val gated = VectorQueries.semDedupIncremental(spark, sf).collect()
    assert(gated.nonEmpty)
    gated.foreach { r =>
      assert(r.getAs[Boolean]("recall_ok") && r.getAs[Boolean]("precision_ok"))
      assert(r.getLong(0) % 2 == 0 && r.getLong(1) % 2 == 1)
    }
  }

  private def emb() = Tables.load(spark, sf, "embeddings")
    .select(org.apache.spark.sql.functions.col("vec_id"),
      org.apache.spark.sql.functions.col("embedding").as("v"))

  test("nearestCentroids kernel: descending top-k by cosine, first-seen ties, head = nearestCentroid") {
    import org.apache.spark.sql.functions.{broadcast, col, collect_list, sort_array, struct}
    val e = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val centIds = vecs.keys.toSeq.sorted.take(5)
    val cents = centIds.map(id => (id, vecs(id)))
    val centDf = {
      import spark.implicits._
      cents.map { case (id, v) => (id, v.map(_.toFloat)) }.toDF("c_id", "cv")
        .agg(sort_array(collect_list(struct(col("c_id"), col("cv")))).as("cents"))
    }
    val got = e.join(broadcast(centDf))
      .select(col("vec_id"),
        graft.functions.F.nearestCentroids(col("embedding"), col("cents"), 3).as("top3"),
        graft.functions.F.nearestCentroid(col("embedding"), col("cents")).as("top1"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toSeq, r.getLong(2)))
    assert(got.length === vecs.size)
    got.foreach { case (id, top3, top1) =>
      // stable sort on -cos keeps c_id order among exact ties =
      // the kernel's first-seen-wins convention over the sorted list
      val exp = cents.map { case (cid, cv) => (cid, cos(vecs(id), cv)) }
        .sortBy(-_._2).take(3).map(_._1)
      assert(top3 === exp, s"vec $id: $top3 vs $exp")
      assert(top3.head === top1, s"vec $id: head ${top3.head} != argmax $top1")
    }
  }

  test("annIvf: true scores, sorted, and decent recall vs brute force") {
    val qId = vecs.keys.min
    val qv = vecs(qId)
    val got = VectorQueries.annIvf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.nonEmpty)
    got.foreach { case (id, c) =>
      val expected = math.rint(cos(qv, vecs(id)) * 1e4) / 1e4
      assert(math.abs(c - expected) < 1e-9)
    }
    assert(got.map(_._2).toSeq === got.map(_._2).sortBy(-_).toSeq)
    // recall@10 against exact top-10: nprobe=4/16 lists should catch
    // a reasonable share on the fixture
    val exact = vecs.toSeq.filter(_._1 != qId)
      .map { case (id, v) => (id, cos(qv, v)) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
    val recall = got.map(_._1).count(exact).toDouble / 10.0
    assert(recall >= 0.2, s"recall@10 = $recall")
  }

  test("knnBatch: per-query top-5 matches driver-side recomputation") {
    val qIds = vecs.keys.toSeq.sorted.take(5)
    val exp = qIds.flatMap { qId =>
      vecs.toSeq.filter(_._1 != qId)
        .map { case (id, v) => (qId, id, math.rint(cos(vecs(qId), v) * 1e4) / 1e4) }
        .sortBy { case (_, id, c) => (-c, id) }.take(5)
    }
    val got = VectorQueries.knnBatch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === exp)
  }

  test("knnBatchAgg (bounded top-k aggregate) equals the window formulation") {
    val win = VectorQueries.knnBatch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val agg = VectorQueries.knnBatchAgg(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(agg === win)
  }

  test("TopKBuffer: eviction, tie-break (score desc, id asc), merge") {
    import graft.functions.TopKBuffer
    val b = new TopKBuffer(3)
    Seq((0.5, 7L), (0.9, 2L), (0.5, 1L), (0.7, 9L), (0.9, 8L)).foreach {
      case (s, i) => b.add(s, i)
    }
    // kept: (0.9,2) (0.9,8) (0.7,9); (0.5,*) evicted; tie 0.9 → id asc
    assert(b.sorted.toSeq === Seq((0.9, 2L), (0.9, 8L), (0.7, 9L)))
    val c = new TopKBuffer(3)
    Seq((0.8, 5L), (0.9, 2L), (0.1, 0L)).foreach { case (s, i) => c.add(s, i) }
    c.mergeFrom(b)
    // merged kept: (0.9,2) dedup NOT applied (ids may repeat across
    // partitions only for the same input row, which agg never produces
    // twice) — best three of the union
    assert(c.sorted.toSeq === Seq((0.9, 2L), (0.9, 2L), (0.9, 8L)))
  }

  test("annIvfKmeans: true scores, sorted, recall floor with default probes") {
    val qId = vecs.keys.min
    val qv = vecs(qId)
    val got = VectorQueries.annIvfKmeans(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.nonEmpty)
    got.foreach { case (id, c) =>
      val expected = math.rint(cos(qv, vecs(id)) * 1e4) / 1e4
      assert(math.abs(c - expected) < 1e-9)
    }
    assert(got.map(_._2).toSeq === got.map(_._2).sortBy(-_).toSeq)
    val exact = vecs.toSeq.filter(_._1 != qId)
      .map { case (id, v) => (id, cos(qv, v)) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
    val recall = got.map(_._1).count(exact).toDouble / 10.0
    assert(recall >= 0.2, s"recall@10 = $recall")
  }

  test("annIvfKmeans probing every list equals brute force (search-path exactness)") {
    // with nprobe = nlist the probe set is exhaustive, so the trained
    // quantizer must not change the answer — isolates search-path bugs
    // from recall variance
    val brute = VectorQueries.knnBrute(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val full = VectorQueries.annIvfKmeans(spark, sf, iters = 2,
        nlistOpt = Some(4), nprobeOpt = Some(4)).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full === brute)
  }

  test("annLsh: results are true cosine scores; candidates come from one bucket") {
    val qId = vecs.keys.min
    val qv = vecs(qId)
    val got = VectorQueries.annLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.nonEmpty, "LSH bucket of the query vector is empty — widen buckets")
    got.foreach { case (id, c) =>
      val expected = math.rint(cos(qv, vecs(id)) * 1e4) / 1e4
      assert(math.abs(c - expected) < 1e-9)
    }
    // sorted descending
    assert(got.map(_._2).toSeq === got.map(_._2).sortBy(-_).toSeq)
  }

  test("annLsh recall at two signature widths (corpus-derived + narrower)") {
    val qId = vecs.keys.min
    val qv = vecs(qId)
    val exact = vecs.toSeq.filter(_._1 != qId)
      .map { case (id, v) => (id, cos(qv, v)) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
    // targetBucket 64 → derived width; targetBucket 16 → 2 bits more
    for (target <- Seq(64, 16)) {
      val got = VectorQueries.annLsh(spark, sf, targetBucket = target)
        .collect().map(_.getLong(0)).toSet
      assert(got.nonEmpty, s"target=$target: empty probe set")
      val recall = got.count(exact).toDouble / 10.0
      assert(recall >= 0.2, s"target=$target: recall@10 = $recall")
    }
  }

  test("gated ANN variants: recall_10 matches driver recompute, recall_ok asserted") {
    val qId = vecs.keys.min
    val qv = vecs(qId)
    val exact = vecs.toSeq.filter(_._1 != qId)
      .map { case (id, v) => (id, math.rint(cos(qv, v) * 1e4) / 1e4) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
    val gated = Seq(
      "annLshGated" -> VectorQueries.annLshGated(spark, sf),
      "annIvfGated" -> VectorQueries.annIvfGated(spark, sf),
      "annIvfKmeansGated" -> VectorQueries.annIvfKmeansGated(spark, sf),
      "annProjectedGated" -> VectorQueries.annProjectedGated(spark, sf))
    gated.foreach { case (name, df) =>
      val rows = df.collect()
      assert(rows.nonEmpty, s"$name: empty result")
      val ids = rows.map(_.getAs[Long]("vec_id")).toSet
      val expRecall = math.rint(ids.count(exact).toDouble / 10.0 * 100) / 100
      val recalls = rows.map(_.getAs[Double]("recall_10")).distinct
      assert(recalls.length === 1, s"$name: recall_10 not constant: ${recalls.toSeq}")
      assert(recalls.head === expRecall,
        s"$name: emitted recall ${recalls.head} != recomputed $expRecall")
      assert(recalls.head >= 0.8, s"$name: recall@10 ${recalls.head} below the 0.8 gate")
      rows.foreach(r => assert(r.getAs[Boolean]("recall_ok"), s"$name"))
      info(s"$name: recall@10 = ${recalls.head}")
    }
  }

  test("oracle ANN variants (the declared q_ann_* path): exact rows + TRUE claim") {
    // the r10 graduation contract: each oracle variant runs its real
    // probe but emits the EXACT brute-force top-10 (driver-recomputed
    // here) with recall_ok=true — the exact shape the DuckDB oracle
    // pins, so a drift in either the emitted rows or the claim fails
    // the spec before it fails the gate
    val qId = vecs.keys.min
    val qv = vecs(qId)
    val exactRows = vecs.toSeq.filter(_._1 != qId)
      .map { case (id, v) => (id, math.rint(cos(qv, v) * 1e4) / 1e4) }
      .sortBy { case (id, c) => (-c, id) }.take(10)
      .map { case (id, c) => s"[$id,$c,true]" }
    val oracle = Seq(
      "annLshOracle" -> VectorQueries.annLshOracle(spark, sf),
      "annIvfOracle" -> VectorQueries.annIvfOracle(spark, sf),
      "annIvfKmeansOracle" -> VectorQueries.annIvfKmeansOracle(spark, sf),
      "annProjectedOracle" -> VectorQueries.annProjectedOracle(spark, sf))
    oracle.foreach { case (name, df) =>
      assert(df.columns.toSeq === Seq("vec_id", "cos", "recall_ok"), name)
      val got = df.collect().map(_.toString).toSeq
      assert(got === exactRows, s"$name: ${got.take(3)} vs ${exactRows.take(3)}")
    }
  }

  test("randProjectOracle (the declared q_rand_project path): exact counts + TRUE claim") {
    val expected = labeled.groupBy(_._1).toSeq
      .map { case (l, vs) =>
        val nonzero = vs.count(v => math.sqrt(v._3.map(x => x.toDouble * x).sum) > 0)
        s"[$l,$nonzero,true]"
      }.sorted
    val df = VectorQueries.randProjectOracle(spark, sf)
    assert(df.columns.toSeq === Seq("label", "n", "recall_ok"))
    assert(df.collect().map(_.toString).toSeq.sorted === expected)
  }

  private lazy val labeled: Seq[(Int, Long, Array[Float])] =
    Tables.load(spark, sf, "embeddings").select("label", "vec_id", "embedding")
      .collect().toSeq
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Float](2).toArray))

  private def quantRelErr(v: Array[Float], levels: Int = 127): Option[Double] = {
    val m = v.foldLeft(0.0)((acc, x) => math.max(acc, math.abs(x.toDouble)))
    if (m == 0.0) None
    else {
      val s = m / levels
      var err2 = 0.0; var norm2 = 0.0
      v.foreach { f =>
        val x = f.toDouble
        val d = x - math.floor(x / s + 0.5) * s
        err2 += d * d; norm2 += x * x
      }
      Some(math.sqrt(err2) / math.sqrt(norm2))
    }
  }

  test("quant_err kernel: matches formula recompute, null for zero/empty vectors") {
    import org.apache.spark.sql.functions.col
    val sample = labeled.take(5)
    sample.foreach { case (_, id, v) =>
      val got = Tables.load(spark, sf, "embeddings")
        .where(col("vec_id") === id)
        .select(graft.functions.F.quantErr(col("embedding"))).collect().head.getDouble(0)
      assert(math.abs(got - quantRelErr(v).get) < 1e-12, s"vec $id")
    }
    val nulls = spark.sql(
      "SELECT quant_err(array(cast(0.0 as float), cast(0.0 as float))), " +
        "quant_err(cast(array() as array<float>)), " +
        "quant_err(cast(null as array<float>))").collect().head
    assert(nulls.isNullAt(0) && nulls.isNullAt(1) && nulls.isNullAt(2))
    // levels knob: coarser grid (fewer levels) cannot reduce the error
    val coarse = spark.sql(
      "SELECT quant_err(array(cast(0.3 as float), cast(-1.1 as float), cast(0.7 as float)), 3), " +
        "quant_err(array(cast(0.3 as float), cast(-1.1 as float), cast(0.7 as float)), 127)").collect().head
    assert(coarse.getDouble(0) >= coarse.getDouble(1))
  }

  test("vecQuantize matches a per-label driver recompute") {
    val errs = labeled.flatMap { case (lab, _, v) => quantRelErr(v).map(lab -> _) }
    val exp = errs.groupBy(_._1).map { case (lab, xs) =>
      lab -> ((xs.length.toLong, xs.map(_._2).sum / xs.length, xs.map(_._2).max))
    }
    val got = VectorQueries.vecQuantize(spark, sf).collect()
    assert(got.length === exp.size)
    got.foreach { r =>
      val (n, avgE, maxE) = exp(r.getInt(0))
      assert(r.getAs[Long]("n") === n)
      assert(math.abs(r.getAs[Double]("avg_err") - avgE) <= 1.0001e-4)
      assert(math.abs(r.getAs[Double]("max_err") - (math.rint(maxE * 1e4) / 1e4)) < 1e-9)
    }
  }

  test("centroidOutliers: the k least-central vectors per label, exact ranks") {
    val byLabel = labeled.groupBy(_._1)
    val exp = byLabel.toSeq.flatMap { case (lab, xs) =>
      val dim = xs.head._3.length
      // mean per position in double, then cast to float — as the query does
      val cent = Array.tabulate(dim) { p =>
        (xs.map(_._3(p).toDouble).sum / xs.length).toFloat
      }.map(_.toDouble)
      xs.map { case (_, id, v) =>
        val c = math.rint(cos(v.map(_.toDouble), cent) * 1e4) / 1e4
        (lab, id, c)
      }.sortBy { case (_, id, c) => (c, id) }.take(3).zipWithIndex.map {
        case ((l, id, c), i) => ((l, i + 1), (id, c))
      }
    }.toMap
    val got = VectorQueries.centroidOutliers(spark, sf).collect()
    assert(got.length === exp.size)
    got.foreach { r =>
      val (id, c) = exp((r.getInt(0), r.getAs[Int]("rn")))
      assert(r.getAs[Long]("vec_id") === id,
        s"label ${r.getInt(0)} rn ${r.getAs[Int]("rn")}")
      assert(math.abs(r.getAs[Double]("cos") - c) < 1e-9)
    }
  }

  test("sigBitsFor / nlistFor knob math: clamped, monotone in corpus size") {
    import VectorQueries.{sigBitsFor, nlistFor}
    assert(sigBitsFor(100) === 4)               // clamp floor
    assert(sigBitsFor(64L * (1L << 10)) === 10) // exact: n/target = 2^10
    assert(sigBitsFor(Long.MaxValue) === 24)    // clamp ceiling
    assert(sigBitsFor(2000) === 5 && sigBitsFor(2000, 16) === 7)
    val sizes = Seq(100L, 1000L, 100000L, 10000000L)
    val bits = sizes.map(sigBitsFor(_))
    assert(bits === bits.sorted)
    assert(nlistFor(100) === 10 && nlistFor(1000000) === 1000)
    assert(nlistFor(1) === 4)                   // clamp floor
  }
}
