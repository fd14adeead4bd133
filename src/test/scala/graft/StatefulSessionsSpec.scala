package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StatefulSessions
import graft.streaming.StatefulSessions.SessionEvent

/** flatMapGroupsWithState sessionization (ST7): gap-closed sessions
  * emit in-stream; trailing sessions flush via event-time timeout as
  * the watermark advances across AvailableNow runs (state persisted in
  * the checkpoint between runs).
  */
class StatefulSessionsSpec extends SparkSpec {

  private def writeEvents(dir: java.nio.file.Path, name: String,
                          rows: Seq[(String, Long)]): Unit = {
    val lines = rows.map { case (u, t) =>
      val ts = new java.sql.Timestamp(t).toInstant.toString
      s"""{"user_id": "$u", "ts": "$ts"}"""
    }
    Files.writeString(dir.resolve(name), lines.mkString("\n") + "\n")
  }

  test("gap-closed sessions emit; trailing sessions flush on watermark timeout") {
    import spark.implicits._
    val in = Files.createTempDirectory("sess-in")
    val out = Files.createTempDirectory("sess-out")
    val ck = Files.createTempDirectory("sess-ck")
    val base = 1700000000000L // fixed epoch ms
    val min = 60000L

    // memory sink cannot recover from a checkpoint, so the multi-run
    // state/watermark persistence goes through a parquet sink
    def runOnce(): Unit = {
      val src = spark.readStream
        .schema("user_id STRING, ts TIMESTAMP")
        .json(in.toString)
        .as[SessionEvent]
      val q = StatefulSessions.sessionize(src, gapSeconds = 1800)
        .writeStream.format("parquet")
        .option("path", out.toString)
        .outputMode("append")
        .option("checkpointLocation", ck.toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def emitted(): Seq[(String, Long, Long)] =
      spark.read.parquet(out.toString).collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime,
          r.getAs[Long]("n_events"))).toSeq

    // file1: user a has session1 (3 events), then >30min gap, session2 (2 events, trailing)
    writeEvents(in, "f1.json", Seq(
      ("a", base), ("a", base + min), ("a", base + 2 * min),
      ("a", base + 60 * min), ("a", base + 61 * min)))
    runOnce()
    val e1 = emitted()
    // session1 closed by the observed gap; session2 still open in state
    assert(e1 === Seq(("a", base, 3L)))

    // file2: much-later event → watermark advances past session2+gap
    writeEvents(in, "f2.json", Seq(("a", base + 300 * min)))
    runOnce()
    // file3: one more batch so the timeout (watermark from file2) fires
    writeEvents(in, "f3.json", Seq(("a", base + 301 * min)))
    runOnce()
    val e3 = emitted()
    assert(e3.contains(("a", base + 60 * min, 2L)),
      s"trailing session not flushed: $e3")
    // the 300/301-min session is still open — not emitted
    assert(!e3.exists(_._2 == base + 300 * min))
  }

  test("lateness > 0: an event more than gap BEFORE the open session is " +
      "its own session, not glued in") {
    import spark.implicits._
    val in = Files.createTempDirectory("sess3-in")
    val out = Files.createTempDirectory("sess3-out")
    val ck = Files.createTempDirectory("sess3-ck")
    val base = 1700000000000L
    val min = 60000L

    def runOnce(): Unit = {
      val src = spark.readStream
        .schema("user_id STRING, ts TIMESTAMP")
        .json(in.toString)
        .as[SessionEvent]
      val q = StatefulSessions.sessionize(src, gapSeconds = 1800,
          latenessSeconds = 240 * 60)
        .writeStream.format("parquet")
        .option("path", out.toString)
        .outputMode("append")
        .option("checkpointLocation", ck.toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // batch 1 opens a session at base+120min (3 events)
    writeEvents(in, "f1.json", Seq(
      ("b", base + 120 * min), ("b", base + 121 * min), ("b", base + 122 * min)))
    runOnce()
    // batch 2: two late events 119-120 min BEFORE the open session's
    // start — far beyond the 30-min gap, within the 240-min lateness.
    // The old guard (t - last <= gap, vacuously true for old t) glued
    // them in, extending the session start backwards by 2 hours.
    writeEvents(in, "f2.json", Seq(("b", base), ("b", base + min)))
    runOnce()

    val emitted = spark.read.parquet(out.toString).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime,
        r.getTimestamp(2).getTime, r.getAs[Long]("n_events"))).toSeq
    // the late pair forms one immediately-closed session of 2 events
    assert(emitted === Seq(("b", base, base + min, 2L)),
      s"late events mishandled: $emitted")
  }

  test("batch-equivalence: stream-emitted sessions match the window formulation") {
    import spark.implicits._
    val in = Files.createTempDirectory("sess2-in")
    val ck = Files.createTempDirectory("sess2-ck")
    val base = 1700000000000L
    val min = 60000L
    // 3 users, mixed sessions, plus a far-future flush event per user
    val rows = (for {
      u <- Seq("u1", "u2", "u3")
      s <- 0 until 3
      e <- 0 until 4
    } yield (u, base + s * 120 * min + e * min)) ++
      Seq(("u1", base + 10000 * min), ("u2", base + 10000 * min),
        ("u3", base + 10000 * min))
    writeEvents(in, "f1.json", rows.take(20))
    writeEvents(in, "f2.json", rows.drop(20))

    val src = spark.readStream.schema("user_id STRING, ts TIMESTAMP")
      .json(in.toString).as[SessionEvent]
    val q = StatefulSessions.sessionize(src, gapSeconds = 1800)
      .writeStream.format("memory").queryName("sessions_eq")
      .outputMode("append")
      .option("checkpointLocation", ck.toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    // expected: driver-side gap fold over all but the flush events
    val expected = rows.groupBy(_._1).flatMap { case (u, es) =>
      val ts = es.map(_._2).sorted
      val sessions = ts.foldLeft(List.empty[(Long, Long, Long)]) {
        case (acc, t) => acc match {
          case (s, l, n) :: rest if t - l <= 1800 * 1000L => (s, t, n + 1) :: rest
          case _ => (t, t, 1L) :: acc
        }
      }
      sessions.drop(1).map { case (s, _, n) => (u, s, n) } // drop open (flush) session
    }.toSet
    val got = spark.table("sessions_eq").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getAs[Long]("n_events")))
      .toSet
    assert(got === expected)
  }
}
