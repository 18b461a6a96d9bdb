package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming exponential moving average — the incremental twin of the
  * batch `w29_ema` query. Where the batch form re-folds each key's whole
  * history, the stream keeps ONE double of state per key (plus the last
  * order key and a count) and applies the identical IEEE fold
  * ema′ = α·v + (1−α)·ema per arrival — the shape that scales to
  * unbounded per-key histories the batch collect cannot hold.
  *
  * Ordering contract: the fold is order-sensitive, so events are sorted
  * (ts, event_id) within each micro-batch, and cross-batch order must be
  * provided by the source (the parity spec feeds batches in event-time
  * order; production puts a watermark-bounded reorder in front or accepts
  * the stream's arrival order as the series order, as real tickers do).
  */
object Ema {

  case class Point(user_id: Long, event_id: Long, ts: Timestamp, value: Double)
  case class EmaState(lastTs: Long, lastId: Long, n: Long, ema: Double)
  case class EmaOut(user_id: Long, n_events: Long, ema_last: Double)

  val Alpha = 0.25

  def emaStream(points: Dataset[Point], alpha: Double = Alpha): Dataset[EmaOut] = {
    import points.sparkSession.implicits._
    points
      .groupByKey(_.user_id)
      .mapGroupsWithState[EmaState, EmaOut](GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Point], state: GroupState[EmaState]) =>
          var st = state.getOption
            .getOrElse(EmaState(Long.MinValue, Long.MinValue, 0L, 0.0))
          it.toSeq.sortBy(p => (p.ts.getTime, p.event_id)).foreach { p =>
            st =
              if (st.n == 0L)
                EmaState(p.ts.getTime, p.event_id, 1L, p.value)
              else
                EmaState(p.ts.getTime, p.event_id, st.n + 1,
                  alpha * p.value + (1 - alpha) * st.ema)
          }
          state.update(st)
          EmaOut(userId, st.n, st.ema)
      }
  }
}
