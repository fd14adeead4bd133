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
}
