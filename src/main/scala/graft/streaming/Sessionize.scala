package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization via flatMapGroupsWithState —
  * the engine's custom-state surface (builder contract: "KeyValue
  * GroupedDataset.mapGroupsWithState/flatMapGroupsWithState for
  * custom state"). 30-minute inactivity gap, one state entry per
  * user (bounded by the active-user count, not the event count —
  * the property that makes this viable on an unbounded stream).
  *
  * StreamingSpec drives it with a watermark and checks the emitted
  * sessions against the batch gaps-and-islands twin (EventKpis q15c).
  */
object Sessionize {

  val GapMicros: Long = 30L * 60 * 1000000

  /** `ts` stays a timestamp so the watermark column survives into the
    * grouped Dataset (EventTimeTimeout requires it); `ts_us` carries
    * exact micros for the gap arithmetic.
    */
  case class Event(user_id: Long, ts: java.sql.Timestamp, ts_us: Long)
  case class SessionState(start_us: Long, last_us: Long, n_events: Long)
  case class Session(user_id: Long, start_us: Long, end_us: Long,
                     n_events: Long)

  /** Close sessions as events arrive; emit a session when the gap is
    * exceeded (or the group times out after the watermark passes).
    */
  def sessionize(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event],
         state: GroupState[SessionState]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            val out = state.getOption.map(s =>
              Session(userId, s.start_us, s.last_us, s.n_events))
            state.remove()
            out.iterator
          } else {
            val sorted = batch.toSeq.sortBy(_.ts_us)
            val closed = Seq.newBuilder[Session]
            // Late in-watermark events that precede the live session's
            // start by MORE than the gap can never merge with it (the
            // batch gaps-and-islands twin would put a session boundary
            // there). Sessionize that prefix separately and emit it
            // closed, instead of dragging start_us backwards across a
            // gap — which would overlap sessions already emitted.
            val (late, mergeable) = state.getOption match {
              case Some(s) => sorted.partition(_.ts_us < s.start_us - GapMicros)
              case None    => (Seq.empty[Event], sorted)
            }
            var lateCur: Option[SessionState] = None
            late.foreach { e =>
              lateCur match {
                case Some(s) if e.ts_us - s.last_us > GapMicros =>
                  closed += Session(userId, s.start_us, s.last_us, s.n_events)
                  lateCur = Some(SessionState(e.ts_us, e.ts_us, 1))
                case Some(s) =>
                  lateCur = Some(SessionState(s.start_us,
                    math.max(s.last_us, e.ts_us), s.n_events + 1))
                case None =>
                  lateCur = Some(SessionState(e.ts_us, e.ts_us, 1))
              }
            }
            lateCur.foreach(s =>
              closed += Session(userId, s.start_us, s.last_us, s.n_events))
            var cur = state.getOption
            mergeable.foreach { e =>
              cur match {
                case Some(s) if e.ts_us - s.last_us > GapMicros =>
                  closed += Session(userId, s.start_us, s.last_us, s.n_events)
                  cur = Some(SessionState(e.ts_us, e.ts_us, 1))
                case Some(s) =>
                  // a late event (within watermark) from an earlier
                  // microbatch may precede s.last_us by at most the
                  // gap — merging (start_us = min) matches the batch
                  // twin; never move the session end backwards
                  cur = Some(SessionState(math.min(s.start_us, e.ts_us),
                    math.max(s.last_us, e.ts_us), s.n_events + 1))
                case None =>
                  cur = Some(SessionState(e.ts_us, e.ts_us, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close the open session once no event can extend it
              state.setTimeoutTimestamp((s.last_us + GapMicros) / 1000)
            }
            closed.result().iterator
          }
      }
  }

  /** Adapter: raw events frame → typed stream with event-time column
    * (micros kept alongside for exact gap arithmetic).
    */
  def prepare(events: DataFrame): Dataset[Event] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .select($"user_id", $"ts", unix_micros($"ts").as("ts_us"))
      .as[Event]
  }
}
