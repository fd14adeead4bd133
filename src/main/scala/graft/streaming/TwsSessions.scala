package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Custom-state sessionization on the `transformWithState` API
  * (SURVEY.md §2.9 ST7 — the arbitrary-stateful-processing successor
  * to `flatMapGroupsWithState`, new in Spark 4): same session
  * semantics as [[StatefulSessions.sessionize]], gated against the
  * SAME SQL oracle, so the two stateful APIs are pinned to agree.
  *
  * What the new API buys at scale, and why both variants ship:
  *  - typed, NAMED state slots (`getValueState`) with per-state TTL —
  *    state evolves by adding slots instead of versioning one case
  *    class blob;
  *  - explicit event-time TIMERS (register/delete per key) decoupled
  *    from state — flatMapGroupsWithState's one-implicit-timeout-per-
  *    key becomes as many independent schedules as the operator needs;
  *  - runs only on the RocksDB state-store provider — changelog
  *    checkpointing + disk-backed state, the store that holds at
  *    100 TB key cardinality where the in-memory HDFS-backed store
  *    OOMs.
  *
  * State per key: one OpenSession (24 bytes) plus one registered
  * timer. In-stream gap closure emits immediately; the trailing open
  * session flushes when the watermark passes its timer. The
  * watermark-delay convention (lateness + gap, session_window parity)
  * and the late-chain handling mirror [[StatefulSessions.sessionize]]
  * line for line — the processor body IS the same merge logic behind
  * the new state/timer surface.
  */
object TwsSessions {
  import StatefulSessions.{OpenSession, SessionEvent, SessionOut}

  private final class SessionProcessor(gapSeconds: Long)
      extends StatefulProcessor[String, SessionEvent, SessionOut] {
    @transient private var open: org.apache.spark.sql.streaming.ValueState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenSession](
        "open", Encoders.product[OpenSession], TTLConfig.NONE)

    private def close(uid: String, s: OpenSession): SessionOut =
      SessionOut(uid, new Timestamp(s.start), new Timestamp(s.last), s.n)

    override def handleInputRows(uid: String, rows: Iterator[SessionEvent],
                                 timers: TimerValues): Iterator[SessionOut] = {
      val sorted = rows.map(_.ts.getTime).toArray.sorted
      val gapMs = gapSeconds * 1000L
      var cur = if (open.exists()) Some(open.get()) else None
      val hadTimer = cur.isDefined
      // late events > gap before the open session gap-split among
      // themselves (cf. StatefulSessions.sessionize: the ascending
      // scan sees all of them before any mergeable event)
      var lateOpen: Option[OpenSession] = None
      val closed = Seq.newBuilder[SessionOut]
      sorted.foreach { t =>
        cur match {
          case Some(s) if t < s.start - gapMs =>
            lateOpen match {
              case Some(ls) if t - ls.last <= gapMs =>
                lateOpen = Some(ls.copy(last = t, n = ls.n + 1))
              case Some(ls) =>
                closed += close(uid, ls)
                lateOpen = Some(OpenSession(t, t, 1))
              case None =>
                lateOpen = Some(OpenSession(t, t, 1))
            }
          case Some(s) if t - s.last <= gapMs =>
            cur = Some(s.copy(start = math.min(s.start, t),
              last = math.max(s.last, t), n = s.n + 1))
          case Some(s) =>
            closed += close(uid, s)
            cur = Some(OpenSession(t, t, 1))
          case None =>
            cur = Some(OpenSession(t, t, 1))
        }
      }
      lateOpen.foreach(ls => closed += close(uid, ls))
      cur.foreach { s =>
        // timers are per-key singletons here: drop the stale schedule
        // before registering the new flush point (clamped above the
        // watermark — registerTimer at/behind it would never fire)
        if (hadTimer) getHandle.listTimers().foreach(getHandle.deleteTimer)
        open.update(s)
        getHandle.registerTimer(
          math.max(s.last + gapMs, timers.getCurrentWatermarkInMs() + 1))
      }
      closed.result().iterator
    }

    override def handleExpiredTimer(uid: String, timers: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[SessionOut] = {
      val out = if (open.exists()) Iterator.single(close(uid, open.get())) else Iterator.empty
      open.clear()
      out
    }
  }

  /** Sessionize with session-window-parity late semantics (watermark
    * delay = lateness + gap; see [[StatefulSessions.sessionize]]). */
  def sessionize(events: Dataset[SessionEvent], gapSeconds: Long,
                 latenessSeconds: Long = 0L): Dataset[SessionOut] = {
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val strEnc = Encoders.STRING
    events
      .withWatermark("ts", s"${latenessSeconds + gapSeconds} seconds")
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapSeconds),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
