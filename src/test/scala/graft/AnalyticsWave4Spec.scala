package graft

import org.apache.spark.sql.functions._
import graft.operators.AnalyticsWave4

/** Fourth-wave operators: MERGE-INTO action partitioning and value
  * provenance, cumulative-distinct growth-accounting identities, and
  * a driver-side rolling-median recompute. */
class AnalyticsWave4Spec extends SparkSpec {

  test("mergeUpsert: actions partition by date range, values by provenance") {
    val rows = AnalyticsWave4.mergeUpsert(spark, sf).collect()
    assert(rows.nonEmpty)
    val (split, cutoff) = (AnalyticsWave4.MergeSplit, AnalyticsWave4.MergeCutoff)
    rows.foreach { r =>
      val dt = r.getString(0)
      val action = r.getAs[String]("action")
      val expected =
        if (dt < split) "keep" else if (dt < cutoff) "update" else "insert"
      assert(action === expected, s"$dt: action $action != $expected")
    }
    // provenance: keep-rows carry the OLD pipeline's numbers (errors
    // dropped), update/insert rows the corrected recompute
    val full = Tables.load(spark, sf, "events")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("dt"))
      .agg(count(lit(1)).as("n"),
        sum(when(lower(coalesce(col("event_type"), lit(""))) === "error", 1L)
          .otherwise(0L)).as("n_err"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    rows.foreach { r =>
      val dt = r.getString(0)
      val (n, nErr) = full(dt)
      val got = r.getAs[Long]("total_events")
      if (r.getAs[String]("action") == "keep")
        assert(got === n - nErr, s"$dt keep: $got != ${n - nErr} (old pipeline)")
      else
        assert(got === n, s"$dt ${r.getAs[String]("action")}: $got != $n (recompute)")
    }
    // the merge must actually repair something: at least one update
    // row differs from the old pipeline's value
    assert(rows.exists(r => r.getAs[String]("action") == "update" &&
      full(r.getString(0))._2 > 0), "fixture has no error rows in the update range")
  }

  test("cumulativeDistinct: growth accounting is exact") {
    val rows = AnalyticsWave4.cumulativeDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    // running sum is internally consistent and monotone
    var acc = 0L
    rows.foreach { r =>
      acc += r.getAs[Long]("new_users")
      assert(r.getAs[Long]("cum_users") === acc, s"${r.getString(0)}: cum != running sum")
    }
    // final cumulative = table-wide exact distinct
    val total = Tables.load(spark, sf, "events")
      .agg(countDistinct(col("user_id"))).collect().head.getLong(0)
    assert(rows.last.getAs[Long]("cum_users") === total,
      s"final cum ${rows.last.getAs[Long]("cum_users")} != exact distinct $total")
    // day 1: every user is new
    val d1 = Tables.load(spark, sf, "events")
      .where(date_format(col("ts"), "yyyy-MM-dd") === rows.head.getString(0))
      .agg(countDistinct(col("user_id"))).collect().head.getLong(0)
    assert(rows.head.getAs[Long]("new_users") === d1)
  }

  test("rollingMedian matches a driver-side recompute over the 7-day frame") {
    val rows = AnalyticsWave4.rollingMedian(spark, sf).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("rev"))
    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    rows.zipWithIndex.foreach { case (r, i) =>
      val frame = revs.slice(math.max(0, i - 6), i + 1).toSeq
      val expMed = BigDecimal(med(frame)).setScale(2, BigDecimal.RoundingMode.HALF_EVEN)
      val expAvg = BigDecimal(frame.sum / frame.size).setScale(2, BigDecimal.RoundingMode.HALF_EVEN)
      assert(math.abs(r.getAs[Double]("rev_med7") - expMed.toDouble) <= 0.011,
        s"${r.getString(0)}: med ${r.getAs[Double]("rev_med7")} != $expMed")
      assert(math.abs(r.getAs[Double]("rev_avg7") - expAvg.toDouble) <= 0.011,
        s"${r.getString(0)}: avg ${r.getAs[Double]("rev_avg7")} != $expAvg")
    }
  }
}
