package graft

import org.apache.spark.sql.functions._
import graft.operators.ForecastQueries

/** Independent Scala-side recomputation of both forecast models from
  * the raw daily series — the property layer under the DuckDB hash
  * oracle (which pins engine parity but not the math itself).
  */
class ForecastSpec extends SparkSpec {

  private def dailySeries: Map[String, Seq[Double]] =
    Tables.load(spark, sf, "events")
      .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("dt"))
      .count().collect()
      .groupBy(_.getString(0))
      .map { case (k, rows) =>
        k -> rows.sortBy(_.getString(1)).map(_.getLong(2).toDouble).toSeq
      }

  test("holtTrend: matches a plain-Scala Holt recursion per series") {
    val got = ForecastQueries.holtTrend(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val series = dailySeries
    assert(got.keySet == series.keySet)
    series.foreach { case (k, xs) =>
      var level = xs(0)
      var trend = xs(1) - xs(0)
      var ape = 0.0
      xs.drop(1).foreach { x =>
        val prior = level + trend
        val l = ForecastQueries.Alpha * x + ForecastQueries.OneMinusAlpha * prior
        val b = ForecastQueries.Beta * (l - level) +
          ForecastQueries.OneMinusBeta * trend
        ape += math.abs(x - prior) / x
        level = l; trend = b
      }
      val r = got(k)
      assert(r.getAs[Long]("n_days") == xs.size)
      assert(math.abs(r.getAs[Double]("level") - level) < 1e-5, k)
      assert(math.abs(r.getAs[Double]("trend") - trend) < 1e-5, k)
      assert(math.abs(r.getAs[Double]("forecast_next") - (level + trend)) < 1e-5, k)
      assert(math.abs(r.getAs[Double]("mape") - ape / (xs.size - 1)) < 1e-5, k)
    }
  }

  test("stlDecompose: components recompose; seasonal sums to zero; edges null") {
    val rows = ForecastQueries.stlDecompose(spark, sf).collect()
      .sortBy(_.getString(0))
    assert(rows.length >= 7)
    // 3-day edges have no complete 7-day window
    (rows.take(3) ++ rows.takeRight(3)).foreach { r =>
      assert(r.isNullAt(r.fieldIndex("trend")), s"edge trend must be null: $r")
      assert(r.isNullAt(r.fieldIndex("resid")))
      assert(!r.getAs[Boolean]("anomaly"), "null resid must not flag")
    }
    rows.drop(3).dropRight(3).foreach { r =>
      // trend equals the centered 7-day mean of raw counts
      val i = rows.indexOf(r)
      val ma = rows.slice(i - 3, i + 4).map(_.getAs[Long]("n")).sum / 7.0
      assert(math.abs(r.getAs[Double]("trend") - ma) < 1e-6, r.getString(0))
      // n = trend + seasonal + resid
      val recomposed = r.getAs[Double]("trend") +
        r.getAs[Double]("seasonal") + r.getAs[Double]("resid")
      assert(math.abs(recomposed - r.getAs[Long]("n")) < 1e-4, r.getString(0))
    }
    // the seasonal component is centered over the series
    val sumSeasonal = rows.map(_.getAs[Double]("seasonal")).sum
    assert(math.abs(sumSeasonal) < 1e-3, s"seasonal not centered: $sumSeasonal")
    // dow matches the calendar (Sunday = 0)
    rows.foreach { r =>
      val expected = java.time.LocalDate.parse(r.getString(0))
        .getDayOfWeek.getValue % 7
      assert(r.getAs[Int]("dow") == expected, r.getString(0))
    }
  }

  test("cusum: recursion recomputes from the raw series; alarms coherent") {
    val rows = ForecastQueries.cusum(spark, sf).collect().sortBy(_.getString(0))
    val xs = Tables.load(spark, sf, "events")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("dt")).count()
      .collect().sortBy(_.getString(0)).map(_.getLong(1).toDouble)
    assert(rows.length == xs.length)
    val n = xs.length.toDouble
    val mu = xs.sum / n
    val sigma = math.sqrt(xs.map(x => x * x).sum / n - mu * mu)
    var spos = 0.0; var sneg = 0.0
    rows.zip(xs).foreach { case (r, x) =>
      val z = (x - mu) / sigma
      spos = math.max(0.0, spos + z - ForecastQueries.CusumK)
      sneg = math.max(0.0, sneg - z - ForecastQueries.CusumK)
      assert(r.getAs[Long]("n") == x.toLong)
      assert(math.abs(r.getAs[Double]("z") - z) < 1e-5, r.getString(0))
      assert(math.abs(r.getAs[Double]("cusum_pos") - spos) < 1e-5, r.getString(0))
      assert(math.abs(r.getAs[Double]("cusum_neg") - sneg) < 1e-5, r.getString(0))
      assert(r.getAs[Boolean]("alarm") ==
        (spos > ForecastQueries.CusumH || sneg > ForecastQueries.CusumH))
      assert(r.getAs[Double]("cusum_pos") >= 0.0)
      assert(r.getAs[Double]("cusum_neg") >= 0.0)
    }
  }

  test("olsTrend: matches the closed-form fit and R2 stays in [0,1]") {
    val got = ForecastQueries.olsTrend(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    dailySeries.foreach { case (k, ys) =>
      val n = ys.size.toDouble
      val ts = (1 to ys.size).map(_.toDouble)
      val (sx, sy) = (ts.sum, ys.sum)
      val sxx = ts.map(t => t * t).sum
      val syy = ys.map(y => y * y).sum
      val sxy = ts.zip(ys).map { case (t, y) => t * y }.sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val intercept = (sy - sx * slope) / n
      val r2 = math.pow(n * sxy - sx * sy, 2) /
        ((n * sxx - sx * sx) * (n * syy - sy * sy))
      val r = got(k)
      assert(math.abs(r.getAs[Double]("slope") - slope) < 1e-6, k)
      assert(math.abs(r.getAs[Double]("intercept") - intercept) < 1e-6, k)
      assert(math.abs(r.getAs[Double]("r2") - r2) < 1e-6, k)
      assert(r.getAs[Double]("r2") >= 0.0 && r.getAs[Double]("r2") <= 1.0, k)
      assert(math.abs(r.getAs[Double]("fit_next") -
        (slope * (n + 1) + intercept)) < 1e-6, k)
    }
  }
}
