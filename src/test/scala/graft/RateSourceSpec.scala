package graft

import org.apache.spark.sql.functions._
import graft.gen.EventGenerator
import graft.streaming.RawIngest

/** S2 realtime branch (reference: produce_events.py:97-98 — wall-clock
  * paced ~20 events/s): the `rate` source paces generation, each row
  * derives the standard wire event, and the stream flows through the
  * SAME RawIngest partition derivation as the backfill/Kafka paths.
  * Asserts the pacing contract (N seconds ⇒ ~N×rate events) and that
  * the derived events are wire-schema-complete with event-time
  * partitions consistent with their timestamps.
  */
class RateSourceSpec extends SparkSpec {

  test("eventsRealtime: rate-paced wire events through RawIngest partitioning") {
    val rate = 50
    val stream = RawIngest.withPartitions(
      EventGenerator.eventsRealtime(spark, rowsPerSecond = rate, seed = "rt"))
    val q = stream.writeStream.format("memory").queryName("rt_events")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("250 milliseconds"))
      .start()
    val t0 = System.nanoTime()
    try {
      Thread.sleep(2500)
      q.processAllAvailable()
      val elapsedSec = (System.nanoTime() - t0) / 1e9
      val rows = spark.table("rt_events").collect()
      // rate source emits floor(elapsed*rate) rows deterministically;
      // allow generous scheduling slack on both sides
      assert(rows.length >= rate * 1,
        s"expected at least ~1s of events, got ${rows.length}")
      assert(rows.length <= rate * (elapsedSec + 2),
        s"expected at most ~${rate * (elapsedSec + 2)}, got ${rows.length}")
      // wire schema + event-time partition consistency
      rows.take(100).foreach { r =>
        assert(r.getAs[String]("user_id").startsWith("u_"))
        assert(r.getAs[String]("event_ts").endsWith("Z"))
        val ts = r.getAs[String]("event_ts")
        assert(r.getAs[String]("date") === ts.substring(0, 10))
        assert(r.getAs[String]("hour") === ts.substring(11, 13))
      }
      // distribution sanity: page_view must dominate at 0.75 weight
      val types = rows.map(_.getAs[String]("event_type"))
      assert(types.count(_ == "page_view") > types.length / 2)
    } finally q.stop()
  }
}
