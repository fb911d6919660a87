package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization over an UNBOUNDED stream — the streaming
  * form of the batch `q_sessionize` query (AnalyticsQueries.scala), built
  * on `flatMapGroupsWithState` with EVENT-TIME timeout:
  *
  *  - per-key state holds only the OPEN session (start/end/count) — not
  *    the events, so state size is O(active keys), independent of
  *    session length or stream length;
  *  - a new event within `gap` of the open session extends it; farther
  *    away, the open session is emitted and a new one starts;
  *  - the watermark passing `session end + gap` proves no extending
  *    event can still arrive, so the timeout callback emits the session
  *    exactly once and clears the state.
  *
  * This is the state-API shape every "close the session when the user
  * goes quiet" pipeline needs and no built-in operator provides (window
  * aggregation emits fixed buckets, `session_window` cannot carry custom
  * per-session payloads beyond aggregates).
  */
object StreamingSessionize {

  final case class Event(userId: Long, ts: java.sql.Timestamp)

  /** Open-session state: bounds + count, in epoch millis. */
  final case class OpenSession(startMs: Long, endMs: Long, nEvents: Long)

  final case class Session(
      userId: Long,
      sessionStart: java.sql.Timestamp,
      sessionEnd: java.sql.Timestamp,
      nEvents: Long
  )

  private def emit(userId: Long, s: OpenSession): Session =
    Session(userId, new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.endMs), s.nEvents)

  /** @param input          event stream (watermark applied here)
    * @param gapMs          inactivity gap that closes a session
    * @param watermarkDelay lateness bound, e.g. "10 minutes"
    */
  def sessions(
      spark: SparkSession,
      input: Dataset[Event],
      gapMs: Long,
      watermarkDelay: String
  ): Dataset[Session] = {
    import spark.implicits._
    input
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.userId)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark passed end + gap: no extending event can arrive
            val closed = state.get
            state.remove()
            Iterator.single(emit(userId, closed))
          } else {
            // micro-batch delivery is unordered within the group
            val sorted = rows.toArray.sortBy(_.ts.getTime)
            val out    = Seq.newBuilder[Session]
            var cur    = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.endMs > gapMs =>
                  out += emit(userId, s)
                  cur = Some(OpenSession(t, t, 1))
                case Some(s) =>
                  cur = Some(OpenSession(s.startMs, math.max(s.endMs, t), s.nEvents + 1))
                case None =>
                  cur = Some(OpenSession(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.endMs + gapMs)
            }
            out.result().iterator
          }
      }
  }
}
