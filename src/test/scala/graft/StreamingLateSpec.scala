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

  private def jline(ts: String, user: String = "u_1"): String =
    s"""{"event_ts":"$ts","user_id":"$user","session_id":"s1",""" +
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

  /** Late-data MATRIX: the native `session_window` aggregate and the
    * custom StatefulSessions flatMapGroupsWithState operator, each
    * driven through a real 4-batch stream with an out-of-order event,
    * at lateness ∈ {0 s, 30 min}. The two operators must agree on
    * every closed session, and the late event must be included iff the
    * watermark admits it — the exact glue gap the r2 regression lived
    * in. Comparison key normalizes the representations: session_window
    * ends at last_event + gap, StatefulSessions at last_event. */
  test("matrix: session_window vs StatefulSessions agree at lateness 0 and 30m") {
    import org.apache.spark.sql.functions._
    import graft.streaming.StatefulSessions
    val gapMs = 30 * 60 * 1000L

    // batches: on-time u_1 pair + u_2 advancer at 11:00; then the late
    // u_1 row at 10:20, which sits EXACTLY in the zone the lateness
    // knob decides: session-window late-filtering is window-end based
    // (drop iff ts + gap ≤ wm), so at lateness 0 (wm 11:00) the row is
    // dropped (10:50 ≤ 11:00) and at lateness 30 m (wm 10:30) it is
    // kept AND merges into u_1's still-live session (session end 10:40
    // > wm). Flushers then push the watermark far past everything.
    val batches = Seq(
      Seq(jline("2024-03-01T10:00:00Z"), jline("2024-03-01T10:10:00Z"),
        jline("2024-03-01T11:00:00Z", "u_2")),
      Seq(jline("2024-03-01T10:20:00Z"), jline("2024-03-01T12:00:00Z", "u_2")),
      Seq(jline("2024-03-01T14:00:00Z", "u_2")),
      Seq(jline("2024-03-01T16:00:00Z", "u_2")))

    // (user, start_ms, last_event_ms, n) for sessions starting < 13:00
    // — the late-timing-independent closed set; later sessions' emission
    // batch depends on watermark-update order, not session semantics.
    val cutoffMs = java.time.Instant.parse("2024-03-01T13:00:00Z").toEpochMilli

    def runMatrix(lateness: String, latenessSec: Long): (Set[(String, Long, Long, Long)], Set[(String, Long, Long, Long)]) = {
      val slug = lateness.replaceAll("\\W", "")
      val in = Files.createTempDirectory(s"late-mx-in-$slug")
      val outW = Files.createTempDirectory(s"late-mx-outw-$slug")
      val ckW = Files.createTempDirectory(s"late-mx-ckw-$slug")
      val outS = Files.createTempDirectory(s"late-mx-outs-$slug")
      val ckS = Files.createTempDirectory(s"late-mx-cks-$slug")
      Seq(in, outW, ckW, outS, ckS).foreach(_.toFile.deleteOnExit())

      def runBoth(): Unit = {
        val src = spark.readStream.schema(EventSchema.schema).json(in.toString)
        val qw = StreamingKpis.sessions(src, gap = "30 minutes", lateness = lateness)
          .writeStream.format("parquet").option("path", outW.toString)
          .outputMode("append").option("checkpointLocation", ckW.toString)
          .trigger(Trigger.AvailableNow()).start()
        import spark.implicits._
        val ses = spark.readStream.schema(EventSchema.schema).json(in.toString)
          .select(col("user_id"), to_timestamp(col("event_ts")).as("ts"))
          .as[StatefulSessions.SessionEvent]
        val qs = StatefulSessions.sessionize(ses, gapSeconds = 1800,
          latenessSeconds = latenessSec)
          .writeStream.format("parquet").option("path", outS.toString)
          .outputMode("append").option("checkpointLocation", ckS.toString)
          .trigger(Trigger.AvailableNow()).start()
        qw.awaitTermination(); qs.awaitTermination()
      }

      batches.zipWithIndex.foreach { case (lines, i) =>
        Files.writeString(in.resolve(s"f$i.json"), lines.mkString("\n") + "\n")
        runBoth()
      }
      val win = spark.read.parquet(outW.toString).collect().map { r =>
        (r.getAs[String]("user_id"),
          r.getAs[java.sql.Timestamp]("session_start").getTime,
          r.getAs[java.sql.Timestamp]("session_end").getTime - gapMs,
          r.getAs[Long]("n_events"))
      }.filter(_._2 < cutoffMs).toSet
      val st = spark.read.parquet(outS.toString).collect().map { r =>
        (r.getAs[String]("user_id"),
          r.getAs[java.sql.Timestamp]("session_start").getTime,
          r.getAs[java.sql.Timestamp]("session_end").getTime,
          r.getAs[Long]("n_events"))
      }.filter(_._2 < cutoffMs).toSet
      (win, st)
    }

    def ms(s: String): Long = java.time.Instant.parse(s).toEpochMilli
    for ((lateness, latenessSec, lateIncluded) <-
           Seq(("0 seconds", 0L, false), ("30 minutes", 1800L, true))) {
      val (win, st) = runMatrix(lateness, latenessSec)
      assert(win === st,
        s"lateness=$lateness: operators diverge\n session_window: $win\n stateful: $st")
      val u1 = if (lateIncluded)
        ("u_1", ms("2024-03-01T10:00:00Z"), ms("2024-03-01T10:20:00Z"), 3L)
      else
        ("u_1", ms("2024-03-01T10:00:00Z"), ms("2024-03-01T10:10:00Z"), 2L)
      val expected = Set(u1,
        ("u_2", ms("2024-03-01T11:00:00Z"), ms("2024-03-01T11:00:00Z"), 1L),
        ("u_2", ms("2024-03-01T12:00:00Z"), ms("2024-03-01T12:00:00Z"), 1L))
      assert(win === expected, s"lateness=$lateness: closed sessions $win != $expected")
    }
  }
}
