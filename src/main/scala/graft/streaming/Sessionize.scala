package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface — SURVEY.md §2.9.
  *
  * The reference is daily-batch only; late/corrected data is handled by
  * re-download + keep-last merge. This module provides the streaming twin
  * for the same event model: gap sessionization over a keyed event stream
  * via flatMapGroupsWithState (the batch-equivalent logic is the
  * `w12_sessionize` registered query — same 30-min-gap semantics), plus a
  * watermarked windowed aggregate for continuous rollups.
  *
  * At scale: state is partitioned by user_id (the group key), watermark
  * bounds state size, and timed-out sessions are emitted exactly once.
  */
object Sessionize {

  case class Event(user_id: Long, event_id: Long, ts: Timestamp)
  case class SessionState(start: Long, last: Long, n: Int, firstEvent: Long)
  case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, first_event: Long)

  val GapMs: Long = 30 * 60 * 1000L

  /** Per-user session accumulator: events within 30 min extend the open
    * session; a larger gap (or state timeout) closes it and emits.
    */
  def sessionizeStream(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
          if (state.hasTimedOut) {
            state.getOption.foreach { s =>
              out += SessionOut(userId, new Timestamp(s.start),
                new Timestamp(s.last), s.n, s.firstEvent)
            }
            state.remove()
          } else {
            var cur = state.getOption
            it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              cur match {
                case Some(s) if e.ts.getTime - s.last <= GapMs =>
                  // max, not assignment: a late (out-of-order but within
                  // watermark) event arriving in a later micro-batch must
                  // not regress session_end below already-seen events —
                  // the batch twin (w12_sessionize) orders globally by ts
                  cur = Some(s.copy(last = math.max(s.last, e.ts.getTime),
                    n = s.n + 1))
                case Some(s) => // gap ⇒ close previous, open new
                  out += SessionOut(userId, new Timestamp(s.start),
                    new Timestamp(s.last), s.n, s.firstEvent)
                  cur = Some(SessionState(e.ts.getTime, e.ts.getTime, 1, e.event_id))
                case None =>
                  cur = Some(SessionState(e.ts.getTime, e.ts.getTime, 1, e.event_id))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + GapMs)
            }
          }
          out.iterator
      }
  }

  /** Watermarked tumbling-window rollup (the streaming face of A1/A2). */
  def windowedRollup(events: Dataset[Event]): Dataset[_] =
    events.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
}
