package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state: sessionization with flatMapGroupsWithState.
  *
  * `session_window` covers the common case declaratively; this operator
  * is the template for session logic the built-in can't express (e.g.
  * emitting per-session summaries only on close, custom close rules).
  * State per user is O(1) — just the open session's accumulator — so
  * state-store size scales with |active users|, not event volume.
  */
object StatefulSessions {

  case class Event(user_id: Long, ts_ms: Long, value: Double)
  case class OpenSession(start_ms: Long, last_ms: Long, n: Long, sum: Double)
  case class ClosedSession(user_id: Long, start_ms: Long, end_ms: Long,
                           n_events: Long, total_value: Double)

  /** Close a session after `gapMs` of inactivity (event-time driven by
    * arriving batches; a production job adds a processing-time timeout so
    * the final session closes without a successor event). */
  def sessionize(events: Dataset[Event], gapMs: Long)
      : Dataset[ClosedSession] = {
    implicit val openEnc: org.apache.spark.sql.Encoder[OpenSession] =
      Encoders.product[OpenSession]
    implicit val closedEnc: org.apache.spark.sql.Encoder[ClosedSession] =
      Encoders.product[ClosedSession]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[OpenSession]) =>
          val sorted = batch.toSeq.sortBy(e => (e.ts_ms, e.value))
          val closed = Seq.newBuilder[ClosedSession]
          var open = state.getOption
          sorted.foreach { e =>
            open match {
              case Some(s) if e.ts_ms - s.last_ms < gapMs =>
                open = Some(s.copy(last_ms = e.ts_ms, n = s.n + 1,
                  sum = s.sum + e.value))
              case Some(s) =>
                closed += ClosedSession(userId, s.start_ms, s.last_ms + gapMs,
                  s.n, s.sum)
                open = Some(OpenSession(e.ts_ms, e.ts_ms, 1, e.value))
              case None =>
                open = Some(OpenSession(e.ts_ms, e.ts_ms, 1, e.value))
            }
          }
          open.foreach(state.update)
          closed.result().iterator
      }
  }
}
