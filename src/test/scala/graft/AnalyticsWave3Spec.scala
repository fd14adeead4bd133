package graft

import graft.operators.AnalyticsWave3

/** Third-wave analytics operators checked with driver-side
  * recomputation / invariants on the sf0.001 fixtures.
  */
class AnalyticsWave3Spec extends SparkSpec {

  test("windowRanks: percent_rank in [0,1], quartiles balanced within priority") {
    val rows = AnalyticsWave3.windowRanks(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Double]("pr") >= 0.0 && r.getAs[Double]("pr") <= 1.0))
    assert(rows.forall(r => r.getAs[Double]("cd") > 0.0 && r.getAs[Double]("cd") <= 1.0))
    rows.groupBy(_.getString(1)).foreach { case (_, rs) =>
      val sizes = rs.groupBy(_.getAs[Int]("quartile")).values.map(_.size)
      assert(sizes.max - sizes.min <= 1)
    }
  }

  test("medianGroups: exact quartiles match a driver-side interpolating recompute") {
    val li = Tables.load(spark, sf, "lineitem")
      .select("l_returnflag", "l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    def quantile(xs: Seq[Double], p: Double): Double = {
      val s = xs.sorted
      val pos = p * (s.length - 1)
      val lo = pos.toInt
      if (lo == s.length - 1) s(lo)
      else s(lo) + (pos - lo) * (s(lo + 1) - s(lo))
    }
    val got = AnalyticsWave3.medianGroups(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    li.groupBy(_._1).foreach { case (flag, vs) =>
      val xs = vs.map(_._2).toSeq
      val (q1, med, q3) = got(flag)
      assert(math.abs(q1 - quantile(xs, 0.25)) < 1e-3)
      assert(math.abs(med - quantile(xs, 0.5)) < 1e-3)
      assert(math.abs(q3 - quantile(xs, 0.75)) < 1e-3)
    }
  }

  test("bitmapDistinct = exact per-day distinct users") {
    import org.apache.spark.sql.functions._
    val exact = Tables.load(spark, sf, "events")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("dt"))
      .agg(countDistinct(col("user_id")).as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = AnalyticsWave3.bitmapDistinct(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === exact)
  }

  test("interpolate: full grid, known hours preserved, gaps between anchors") {
    val rows = AnalyticsWave3.interpolate(spark, sf).collect()
    assert(rows.length === 30 * 24)
    assert(rows.forall(r => !r.isNullAt(1)))
    // interpolated series has no value outside the global [min,max] of anchors
    val vs = rows.map(_.getDouble(1))
    assert(vs.forall(v => v >= vs.min && v <= vs.max))
  }

  test("attribution: purchase total conserved, channels limited") {
    import org.apache.spark.sql.functions._
    val rows = AnalyticsWave3.attribution(spark, sf).collect()
    val totalPurch = Tables.load(spark, sf, "events")
      .where(lower(coalesce(col("event_type"), lit(""))) === "purchase").count()
    assert(rows.map(_.getAs[Long]("purchases")).sum === totalPurch)
    assert(rows.forall(r => Set("view", "click", "direct")(r.getString(1))))
  }

  test("oovRate: rates in [0,1]; a 1000-token vocab covers most tokens") {
    val rows = AnalyticsWave3.oovRate(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val x = r.getAs[Double]("oov_rate"); x >= 0.0 && x <= 1.0
    })
  }

  test("modeGroups: per-day mode matches driver recompute with (cnt desc, et) ties") {
    import org.apache.spark.sql.functions._
    val counts = Tables.load(spark, sf, "events")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("dt"),
        lower(coalesce(col("event_type"), lit(""))).as("et"))
      .count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val exp = counts.groupBy(_._1).view.mapValues { rs =>
      rs.minBy(t => (-t._3, t._2))._2
    }.toMap
    val got = AnalyticsWave3.modeGroups(spark, sf).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === exp)
  }

  test("canonicalReps: each representative is its cluster's longest member") {
    val reps = graft.operators.DupClusters.canonicalReps(spark, sf).collect()
    assert(reps.nonEmpty)
    val chars = Tables.load(spark, sf, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    reps.foreach { r =>
      assert(r.getAs[Long]("rep_chars") === chars(r.getAs[Long]("rep_id")))
      assert(r.getAs[Long]("n_members") >= 2)
    }
  }

  test("gapsIslands: islands are maximal consecutive-day runs (driver recompute)") {
    import org.apache.spark.sql.functions._
    val days = Tables.load(spark, sf, "events")
      .select(col("user_id"), to_date(col("ts")).cast("string").as("d"))
      .distinct().collect()
      .map(r => (r.getLong(0), java.time.LocalDate.parse(r.getString(1))))
    val exp = days.groupBy(_._1).view.mapValues { ds =>
      val sorted = ds.map(_._2).sortBy(_.toEpochDay)
      val islands = sorted.foldLeft(List.empty[List[java.time.LocalDate]]) {
        case (acc @ (h :: t), d) if h.nonEmpty && h.head.toEpochDay == d.toEpochDay - 1 =>
          (d :: h) :: t
        case (acc, d) => List(d) :: acc
      }
      islands.filter(_.size >= 3)
        .map(i => (i.last.toString, i.head.toString, i.size.toLong)).sortBy(_._1)
    }.toMap
    val got = AnalyticsWave3.gapsIslands(spark, sf).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(r =>
        (r.getString(1), r.getString(2), r.getAs[Long]("len"))).toList.sortBy(_._1)).toMap
    assert(got === exp.filter(_._2.nonEmpty))
  }

  test("shareOfDay: shares sum to ~1 per day") {
    val rows = AnalyticsWave3.shareOfDay(spark, sf).collect()
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(math.abs(rs.map(_.getAs[Double]("share")).sum - 1.0) < 1e-4)
    }
  }

  test("yoyGrowth: growth defined exactly where a 12-month-earlier month exists") {
    val rows = AnalyticsWave3.yoyGrowth(spark, sf).collect()
    val months = rows.map(_.getString(0))
    assert(months.sameElements(months.sorted))
    val withGrowth = rows.filter(!_.isNullAt(2))
    assert(withGrowth.length === rows.length - 12)
  }

  test("madOutliers: fences match a driver-side median/MAD recompute") {
    val rows = AnalyticsWave3.madOutliers(spark, sf).collect()
    val ord = Tables.load(spark, sf, "orders")
      .select("o_orderpriority", "o_totalprice").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    def medOf(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val pos = 0.5 * (s.length - 1)
      val lo = pos.toInt
      if (lo == s.length - 1) s(lo) else s(lo) + (pos - lo) * (s(lo + 1) - s(lo))
    }
    rows.foreach { r =>
      val xs = ord.filter(_._1 == r.getString(0)).map(_._2).toSeq
      val med = medOf(xs)
      val mad = medOf(xs.map(x => math.abs(x - med)))
      assert(math.abs(r.getAs[Double]("med") - med) < 0.011)
      assert(math.abs(r.getAs[Double]("mad") - mad) < 0.011)
      val nOut = xs.count(x => math.abs(x - med) > 3 * 1.4826 * mad)
      assert(r.getAs[Long]("n_outliers") === nOut)
      assert(r.getAs[Long]("n") === xs.size)
    }
  }

  test("equidepthHist: buckets cover all orders with balanced depths") {
    val rows = AnalyticsWave3.equidepthHist(spark, sf).collect()
    val nOrders = Tables.load(spark, sf, "orders").count()
    assert(rows.map(_.getAs[Long]("n")).sum === nOrders)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val ns = rs.map(_.getAs[Long]("n"))
      assert(ns.max - ns.min <= 1)
      // bucket ranges are ordered and non-overlapping
      val ord = rs.sortBy(_.getAs[Int]("bucket"))
      ord.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("hi") <= b.getAs[Double]("lo") + 1e-9)
        case _ =>
      }
    }
  }
}
