package graft

import java.sql.Timestamp
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.apache.spark.sql.DataFrame
import graft.batch.DailyKpis

/** Property-based checks of the KPI fold (SURVEY.md §5): invariants
  * the reference's accumulator loop guarantees by construction
  * (daily_kpis.py:109-140) must hold for the distributed aggregation
  * on arbitrary inputs — including nulls and synonym event types.
  */
object KpiProperties extends Properties("DailyKpis") {

  // Spark jobs per trial — keep trial counts low
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withWorkers(1)

  private lazy val spark = SparkTestSession.spark

  private val genEvent: Gen[(Option[String], Option[String], Option[String], Long, Option[Double])] =
    for {
      uid <- Gen.option(Gen.oneOf("u1", "u2", "u3", "u4"))
      sid <- Gen.option(Gen.oneOf("s1", "s2", "s3", "s4", "s5"))
      et <- Gen.option(Gen.oneOf("page_view", "PAGEVIEW", "view", "purchase",
        "Order", "checkout", "add_to_cart", "weird"))
      // a few days around a fixed epoch
      ts <- Gen.choose(1700000000000L, 1700000000000L + 4L * 86400000L)
      price <- Gen.option(Gen.choose(1.0, 200.0))
    } yield (uid, sid, et, ts, price)

  private def toDf(rows: List[(Option[String], Option[String], Option[String], Long, Option[Double])]): DataFrame = {
    import spark.implicits._
    rows.map { case (u, s, e, t, p) =>
      (u.orNull, s.orNull, e.orNull, new Timestamp(t), p.map(Double.box).orNull.asInstanceOf[java.lang.Double])
    }.toDF("user_id", "session_id", "event_type", "ts", "price")
  }

  private def kpis(rows: List[(Option[String], Option[String], Option[String], Long, Option[Double])]) =
    DailyKpis.aggregateEvents(toDf(rows)).collect()
      .map(r => r.getAs[String]("dt") -> r).toMap

  property("per-day invariants: distincts/conditionals bounded by totals") =
    Prop.forAll(Gen.listOfN(40, genEvent)) { rows =>
      rows.isEmpty || kpis(rows).values.forall { r =>
        val total = r.getAs[Long]("total_events")
        r.getAs[Long]("unique_users") <= total &&
          r.getAs[Long]("unique_sessions") <= total &&
          r.getAs[Long]("pageviews") + r.getAs[Long]("purchases") <= total &&
          r.getAs[Double]("revenue_usd") >= 0.0
      }
    }

  property("fold merge: counts add, distincts sub-add, revenue adds") =
    Prop.forAll(Gen.listOfN(25, genEvent), Gen.listOfN(25, genEvent)) { (a, b) =>
      val ka = kpis(a); val kb = kpis(b); val kab = kpis(a ++ b)
      kab.forall { case (dt, r) =>
        val (ra, rb) = (ka.get(dt), kb.get(dt))
        def g(o: Option[org.apache.spark.sql.Row], c: String): Long =
          o.map(_.getAs[Long](c)).getOrElse(0L)
        def d(o: Option[org.apache.spark.sql.Row]): Double =
          o.map(_.getAs[Double]("revenue_usd")).getOrElse(0.0)
        r.getAs[Long]("total_events") == g(ra, "total_events") + g(rb, "total_events") &&
          r.getAs[Long]("pageviews") == g(ra, "pageviews") + g(rb, "pageviews") &&
          r.getAs[Long]("purchases") == g(ra, "purchases") + g(rb, "purchases") &&
          r.getAs[Long]("unique_users") <= g(ra, "unique_users") + g(rb, "unique_users") &&
          r.getAs[Long]("unique_users") >= math.max(g(ra, "unique_users"), g(rb, "unique_users")) &&
          math.abs(r.getAs[Double]("revenue_usd") - (d(ra) + d(rb))) < 0.02
      }
    }

  property("day groups partition the input: totals sum to row count") =
    Prop.forAll(Gen.listOfN(40, genEvent)) { rows =>
      rows.isEmpty ||
        kpis(rows).values.map(_.getAs[Long]("total_events")).sum == rows.size
    }
}
