package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state sessionization via `flatMapGroupsWithState` (SURVEY.md
  * §2.9 ST7): explicit per-user session state with event-time
  * timeouts, for session semantics the built-in `session_window`
  * can't express (emit-on-close with custom payloads, caps, counters).
  *
  * State is one open session per user — constant size per key; closed
  * sessions are emitted as soon as a gap is observed in-stream, and
  * trailing sessions are flushed by event-time timeout when the
  * watermark passes session_end + gap. Works identically under
  * repeated Trigger.AvailableNow runs (state and watermark persist in
  * the checkpoint).
  */
object StatefulSessions {

  case class SessionEvent(user_id: String, ts: Timestamp)
  case class SessionOut(user_id: String, session_start: Timestamp,
                        session_end: Timestamp, n_events: Long)
  /** open-session state: bounds per-key state to 24 bytes. */
  case class OpenSession(start: Long, last: Long, n: Long)

  /** Sessionize with session-window-parity late semantics.
    *
    * Late-row handling: Spark filters rows behind the watermark
    * UPSTREAM of every stateful operator, including this one, with a
    * plain `ts < watermark` predicate — but the native session_window
    * aggregate's effective drop rule is WINDOW-END based (a row
    * survives iff its prospective session window [ts, ts+gap) still
    * reaches the watermark), because a row within `gap` of the
    * watermark can still merge into a live session. To make the two
    * operators agree (StreamingLateSpec's lateness matrix), this
    * operator registers its watermark with delay = lateness + gap:
    * the upstream `ts < maxEventTime − (lateness+gap)` filter is then
    * exactly session_window's `ts + gap < maxEventTime − lateness`.
    * The cost is that event-time timeouts fire one `gap` of watermark
    * progress later than session_window's emission — same sessions,
    * slightly lazier flush. */
  def sessionize(events: Dataset[SessionEvent], gapSeconds: Long,
                 latenessSeconds: Long = 0L): Dataset[SessionOut] = {
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val strEnc = Encoders.STRING

    def close(uid: String, s: OpenSession): SessionOut =
      SessionOut(uid, new Timestamp(s.start), new Timestamp(s.last), s.n)

    events
      .withWatermark("ts", s"${latenessSeconds + gapSeconds} seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid, it: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          if (it.isEmpty && state.hasTimedOut) {
            // watermark passed last_event + gap: flush the open session
            val out = state.getOption.map(close(uid, _)).toSeq
            state.remove()
            out.iterator
          } else {
            // Rows reaching here already passed Spark's upstream
            // `ts < watermark` filter, which the gap-augmented
            // watermark delay (see scaladoc) makes equivalent to
            // session_window's window-end drop rule.
            val sorted = it.map(_.ts.getTime).toArray.sorted
            val gapMs = gapSeconds * 1000L
            var open = state.getOption
            // late events landing more than gap BEFORE the open
            // session (lateness > 0, out-of-order arrival): gap-split
            // among THEMSELVES, never glued into the open session —
            // the sort-then-gap semantics of the batch oracle. The
            // ascending scan sees all such events before any
            // mergeable one, so one builder suffices.
            var lateOpen: Option[OpenSession] = None
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { t =>
              open match {
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
                  // in [start - gap, last + gap]: merge; a late event
                  // within gap of start extends the session backwards
                  open = Some(s.copy(start = math.min(s.start, t),
                    last = math.max(s.last, t), n = s.n + 1))
                case Some(s) =>
                  closed += close(uid, s)
                  open = Some(OpenSession(t, t, 1))
                case None =>
                  open = Some(OpenSession(t, t, 1))
              }
            }
            // every late-chain event is > gap before the (possibly
            // extended) open session start, so the chain can never
            // bridge into it: close it now
            lateOpen.foreach(ls => closed += close(uid, ls))
            open.foreach { s =>
              state.update(s)
              // With lateness > gap, last + gap can land at/behind the
              // watermark (setTimeoutTimestamp throws); clamp above it.
              state.setTimeoutTimestamp(
                math.max(s.last + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.result().iterator
          }
      }
  }
}
