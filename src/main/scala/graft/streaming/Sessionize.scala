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
            // ONE gaps-and-islands walk over the stored session plus the
            // whole sorted batch — exactly the batch twin's (q15c)
            // semantics. Splitting the batch against the live session's
            // start misses chains: a late event can reach the session
            // THROUGH an intermediate same-batch event (late→bridge ≤ gap,
            // bridge→session ≤ gap) and must merge, not close early. The
            // stored session enters the walk as a pre-merged interval;
            // every closed prefix session then ends > gap before its
            // successor's start by construction.
            val items =
              (state.getOption.toSeq ++
                batch.map(e => SessionState(e.ts_us, e.ts_us, 1)))
                .sortBy(s => (s.start_us, s.last_us))
            val closed = Seq.newBuilder[Session]
            var cur: Option[SessionState] = None
            items.foreach { s =>
              cur match {
                case Some(c) if s.start_us - c.last_us > GapMicros =>
                  closed += Session(userId, c.start_us, c.last_us, c.n_events)
                  cur = Some(s)
                case Some(c) =>
                  cur = Some(SessionState(c.start_us,
                    math.max(c.last_us, s.last_us), c.n_events + s.n_events))
                case None =>
                  cur = Some(s)
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
