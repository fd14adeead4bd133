package graft

import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger
import graft.model.EventSchema
import graft.streaming.StreamingKpis

/** ST3 late-data semantics in a REAL stream (not batch mode): rows
  * arriving beyond the watermark (event time < max event time −
  * lateness) are dropped from windowed aggregates; windows emit
  * exactly once (append mode) with the on-time counts.
  */
class StreamingLateSpec extends SparkSpec {

  private def jline(ts: String): String =
    s"""{"event_ts":"$ts","user_id":"u_1","session_id":"s1",""" +
      s""""event_type":"page_view","page":"/home","product_id":"sku_1",""" +
      s""""price":null,"currency":"USD","referrer":"direct","user_agent":"ua"}"""

  test("windowed: a row later than the watermark is dropped; window emits on-time count") {
    val in = Files.createTempDirectory("late-in")
    val out = Files.createTempDirectory("late-out")
    val ck = Files.createTempDirectory("late-ck")
    Seq(in, out, ck).foreach(_.toFile.deleteOnExit())

    def runOnce(): Unit = {
      val src = spark.readStream.schema(EventSchema.schema).json(in.toString)
      val q = StreamingKpis.windowed(src, "1 hour", lateness = "10 minutes")
        .writeStream.format("parquet")
        .option("path", out.toString)
        .outputMode("append")
        .option("checkpointLocation", ck.toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // batch 1: three on-time events in [10:00, 11:00) plus an
    // advancer at 13:00 → watermark after the batch = 12:50
    Files.writeString(in.resolve("f1.json"), Seq(
      jline("2024-03-01T10:00:00Z"), jline("2024-03-01T10:05:00Z"),
      jline("2024-03-01T10:10:00Z"), jline("2024-03-01T13:00:00Z"))
      .mkString("\n") + "\n")
    runOnce()

    // batch 2: an event at 10:20 — 2.5 h behind the 12:50 watermark,
    // far beyond the 10-min lateness → MUST be dropped; the
    // [10:00,11:00) window (end 11:00 < watermark) emits this batch
    Files.writeString(in.resolve("f2.json"),
      jline("2024-03-01T10:20:00Z") + "\n")
    runOnce()

    val rows = spark.read.parquet(out.toString).collect()
      .map(r => (r.getAs[java.sql.Timestamp]("window_start").toInstant.toString,
        r.getAs[Long]("total_events")))
    assert(rows.toSeq === Seq(("2024-03-01T10:00:00Z", 3L)),
      s"late row not dropped or window not emitted once: ${rows.toSeq}")
  }
}
