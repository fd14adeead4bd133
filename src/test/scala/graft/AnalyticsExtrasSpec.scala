package graft

import graft.operators.AnalyticsExtras

/** Invariant tests for the second-wave analytics operators, all
  * recomputed driver-side from the sf0.001 fixture so they are
  * independent of the DuckDB oracle path.
  */
class AnalyticsExtrasSpec extends SparkSpec {

  test("topPaths: paths bounded at 8 steps, counts positive and ranked") {
    val rows = AnalyticsExtras.topPaths(spark, sf).collect()
    assert(rows.nonEmpty)
    val ns = rows.map(_.getAs[Long]("n_sessions"))
    assert(ns.forall(_ > 0))
    assert(ns.sameElements(ns.sorted(Ordering[Long].reverse)))
    rows.foreach { r =>
      val steps = r.getAs[String]("path").split(">")
      assert(steps.length <= 8)
    }
  }

  test("scd2Dims: per customer — one current row, contiguous intervals, no same-priority adjacency") {
    val rows = AnalyticsExtras.scd2Dims(spark, sf).collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[String]("priority"),
        r.getAs[String]("valid_from"), r.getAs[String]("valid_to"),
        r.getAs[Boolean]("is_current")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, hist) =>
      assert(hist.count(_._5) === 1, "exactly one open interval per customer")
      val h = hist.sortBy(r => (r._3, r._2))
      // every closed interval's valid_to is some other row's valid_from
      // (change dates chain — intervals tile the customer's history)
      val froms = h.map(_._3).toSet
      h.filter(!_._5).foreach { r => assert(froms.contains(r._4)) }
      // the single current row has null valid_to
      assert(h.filter(_._5).forall(_._4 == null))
    }
  }

  test("slidingDistinct: trailing-7d count >= that day's exact distinct, <= cumulative distinct") {
    import org.apache.spark.sql.functions._
    val perDay = Tables.load(spark, sf, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(countDistinct(col("user_id")).as("u1"))
      .collect().map(r => (r.getAs[java.sql.Date]("day").toString, r.getAs[Long]("u1"))).toMap
    val total = Tables.load(spark, sf, "events")
      .select(col("user_id")).distinct().count()
    val rows = AnalyticsExtras.slidingDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getAs[String]("d"); val u7 = r.getAs[Long]("users_7d")
      assert(u7 >= perDay(d))
      assert(u7 <= total)
    }
  }

  test("trainSplit: splits partition the corpus and are run-deterministic") {
    val a = AnalyticsExtras.trainSplit(spark, sf).collect()
      .map(r => (r.getAs[String]("split"), r.getAs[Long]("n_docs"), r.getAs[Long]("sum_chars")))
    val total = Tables.load(spark, sf, "documents").count()
    assert(a.map(_._2).sum === total)
    assert(a.map(_._1).toSet === Set("train", "val", "test"))
    val train = a.find(_._1 == "train").get._2.toDouble / total
    assert(train > 0.7 && train < 0.9, s"train fraction $train should be ~0.8")
    val b = AnalyticsExtras.trainSplit(spark, sf).collect()
      .map(r => (r.getAs[String]("split"), r.getAs[Long]("n_docs"), r.getAs[Long]("sum_chars")))
    assert(a.sameElements(b))
  }

  test("fuzzyJoin: pairs block-consistent, distance verified, no mirror duplicates") {
    val parts = Tables.load(spark, sf, "part")
      .selectExpr("p_partkey", "p_name", "p_type", "p_size").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getInt(3)))).toMap
    def lev(s: String, t: String): Int = {
      val d = Array.tabulate(s.length + 1, t.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to s.length; j <- 1 to t.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
      d(s.length)(t.length)
    }
    val rows = AnalyticsExtras.fuzzyJoin(spark, sf).collect()
    assert(rows.nonEmpty)
    val seen = scala.collection.mutable.Set.empty[(Long, Long)]
    rows.foreach { r =>
      val ak = r.getAs[Long]("a_key"); val bk = r.getAs[Long]("b_key")
      assert(ak < bk)
      assert(seen.add((ak, bk)), "pair emitted once")
      val (an, at, as_) = parts(ak); val (bn, bt, bs) = parts(bk)
      assert(at == bt && as_ == bs, "blocking keys agree")
      assert(lev(an, bn) === r.getAs[Long]("dist"))
      assert(r.getAs[Long]("dist") <= 4)
    }
  }

  test("variantShred agrees with the string-path JSON extraction") {
    import org.apache.spark.sql.functions._
    val expected = Tables.load(spark, sf, "events")
      .select(lower(coalesce(col("event_type"), lit(""))).as("et"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("et"))
      .agg(count(col("k")).as("n_k"), sum(col("k")).as("sum_k"), max(col("k")).as("max_k"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val got = AnalyticsExtras.variantShred(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (n, s, m) = expected(r.getAs[String]("et"))
      assert(r.getAs[Long]("n_k") === n)
      assert(r.getAs[Long]("sum_k") === s)
      assert(r.getAs[Long]("max_k") === m)
    }
    assert(got.length === expected.size)
  }

  test("ewmaSmooth: smoothed value lies within the trailing window's rev envelope") {
    val rows = AnalyticsExtras.ewmaSmooth(spark, sf).collect()
      .map(r => (r.getAs[String]("hour"), r.getAs[Double]("rev"), r.getAs[Double]("rev_ewma")))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    rows.zipWithIndex.foreach { case ((_, _, ewma), i) =>
      // convex combination of trailing revs (gaps allowed — envelope
      // is over the hours actually present in the trailing 12)
      val window = rows.slice(math.max(0, i - 11), i + 1).map(_._2)
      assert(ewma >= window.min - 0.01 && ewma <= window.max + 0.01)
    }
    // the smoother must not be the identity everywhere
    assert(rows.exists { case (_, rev, ewma) => math.abs(rev - ewma) > 0.01 })
  }

  test("lmScore: NLL positive, doc counts partition the corpus, constant-corpus lower bound") {
    import graft.operators.TextQueries
    val rows = TextQueries.lmScore(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("lang"),
        r.getAs[Long]("n_docs"), r.getAs[Double]("avg_nll")))
    assert(rows.nonEmpty)
    val total = Tables.load(spark, sf, "documents").count()
    assert(rows.map(_._3).sum === total)
    // -ln(p) > 0 for any MLE unigram prob < 1; == 0 only if the corpus
    // is a single repeated token, which the fixture is not
    assert(rows.forall(_._4 > 0))
  }

  test("splitLeakage agrees with a driver-side normalized-key recompute") {
    import graft.operators.TextQueries
    val docs = Tables.load(spark, sf, "documents")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def split(id: Long): String = {
      val h2 = md5hex(id.toString).substring(0, 2)
      if (h2 < "cd") "train" else if (h2 < "e6") "val" else "test"
    }
    def key(text: String): String =
      text.split("\\s+").distinct.sorted.mkString(" ")
    val byKey = docs.map { case (id, t) => (split(id), id, key(t)) }
    val trainKeys = byKey.filter(_._1 == "train").map(x => (x._3, x._2))
    val trainKeySet = trainKeys.map(_._1).toSet
    val expected = byKey.filter(x => x._1 != "train" && trainKeySet.contains(x._3))
      .groupBy(_._1)
      .map { case (s, leaked) =>
        val keys = leaked.map(_._3).toSet
        s -> ((leaked.map(_._2).distinct.length.toLong,
          trainKeys.filter(k => keys.contains(k._1)).map(_._2).distinct.length.toLong))
      }
    val got = TextQueries.splitLeakage(spark, sf).collect()
      .map(r => r.getAs[String]("split") ->
        ((r.getAs[Long]("n_leaked_eval_docs"), r.getAs[Long]("n_train_dups")))).toMap
    assert(got === expected)
    assert(got.nonEmpty, "fixture must exhibit cross-split duplicates")
  }

  test("hardNegatives: labels differ from anchor, ranks agree with brute-force recompute") {
    import graft.operators.VectorQueries
    val vecs = Tables.load(spark, sf, "embeddings")
      .selectExpr("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    val byId = vecs.map(v => v._1 -> v).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val rows = VectorQueries.hardNegatives(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"), r.getAs[Double]("cos")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (qid, got) =>
      val (_, qLabel, qv) = byId(qid)
      assert(got.length === 3)
      got.foreach { case (_, nid, _) => assert(byId(nid)._2 != qLabel) }
      val brute = vecs.filter(_._2 != qLabel)
        .map(v => (v._1, BigDecimal(cos(v._3, qv)).setScale(4, BigDecimal.RoundingMode.HALF_EVEN).toDouble))
        .sortBy { case (id, c) => (-c, id) }.take(3).map(_._1)
      assert(got.sortBy(r => (-r._3, r._2)).map(_._2).sameElements(brute))
    }
  }

  test("concurrency: hour counts match a driver-side sessionize + interval expansion") {
    val evs = Tables.load(spark, sf, "events")
      .selectExpr("user_id", "event_id", "cast(ts as long) as sec")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:00")
      .withZone(java.time.ZoneOffset.UTC)
    val counts = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    evs.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      var sessStart = sorted.head._3; var prev = sorted.head._3
      def close(endSec: Long): Unit = {
        var h = sessStart / 3600
        while (h <= endSec / 3600) {
          counts(fmt.format(java.time.Instant.ofEpochSecond(h * 3600))) += 1
          h += 1
        }
      }
      sorted.tail.foreach { r =>
        if (r._3 - prev > 1800) { close(prev); sessStart = r._3 }
        prev = r._3
      }
      close(prev)
    }
    val got = AnalyticsExtras.concurrency(spark, sf).collect()
      .map(r => (r.getAs[String]("hour"), r.getAs[Long]("n_active_sessions")))
    assert(got.nonEmpty)
    assert(got.toMap === counts.toMap)
  }

  test("weightedSample: matches driver A-Res recompute and over-represents long docs") {
    val docs = Tables.load(spark, sf, "documents")
      .selectExpr("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def key(id: Long, w: Long): Double = {
      val u = (java.lang.Long.parseLong(md5hex(id.toString).substring(0, 8), 16) + 1.0) / 4294967296.0
      math.log(u) / math.max(w, 1L)
    }
    val expected = docs.groupBy(_._1).toSeq.flatMap { case (_, ds) =>
      ds.sortBy(d => (-key(d._2, d._3), d._2)).take(10).toSeq
    }.map(d => (d._1, d._2)).toSet
    val got = AnalyticsExtras.weightedSample(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id")))
    assert(got.length === got.toSet.size)
    assert(got.toSet === expected)
    // inclusion prob ∝ n_chars: the weighted sample's mean length must
    // exceed the corpus mean (holds deterministically for this fixture)
    val byId = docs.map(d => d._2 -> d._3).toMap
    val sampleMean = got.map(g => byId(g._2)).sum.toDouble / got.length
    val corpusMean = docs.map(_._3).sum.toDouble / docs.length
    assert(sampleMean > corpusMean)
  }

  test("scd2Lookup: exactly one version per in-range shipment (no drop, no fan-out)") {
    import org.apache.spark.sql.functions._
    val total = AnalyticsExtras.scd2Lookup(spark, sf)
      .agg(sum(col("n_shipments"))).collect()(0).getLong(0)
    // a shipment matches iff its date >= the customer's FIRST version
    // start (intervals tile the rest of the timeline gap-free)
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), to_date(col("l_shipdate")).as("sd"))
    val ord = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val firstVersion = AnalyticsExtras.scd2Dims(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(min(col("valid_from").cast("date")).as("first_vf"))
    val expected = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(firstVersion, Seq("o_custkey"))
      .where(col("sd") >= col("first_vf"))
      .count()
    assert(total == expected, s"lookup total $total != in-range facts $expected")
  }
}
