package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Gap sessionization on Spark 4's transformWithState with EVENT-TIME
  * TIMERS — the new-API successor to the flatMapGroupsWithState
  * sessionizer (streaming/StreamingSessionize.scala, which stays as
  * legacy-API coverage). A session closes when the WATERMARK passes
  * (last event time + gap): the timer fires exactly once per closed
  * session, instead of every-batch timeout polling.
  *
  * Scale posture: state per key is one fixed-size aggregate (count,
  * start, end) in its own RocksDB column family; timers are the
  * engine's sorted timer index, so a billion idle sessions cost no
  * per-batch work — the property that matters when sessionizing a
  * full event firehose. Stale timers (a session extended after an
  * earlier timer was registered) are detected by comparing the timer's
  * expiry against the CURRENT session end, so no timer deletion is
  * needed on the hot path.
  */
object TwsSessionize {

  final case class SessAgg(n: Long, startMs: Long, endMs: Long)
  final case class Session(user: String, events: Long, startMs: Long, endMs: Long)

  final class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[String, (java.sql.Timestamp, String), Session] {
    @transient private var agg: org.apache.spark.sql.streaming.ValueState[SessAgg] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      agg = getHandle.getValueState[SessAgg]("sess", Encoders.product[SessAgg], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[(java.sql.Timestamp, String)],
        timers: TimerValues): Iterator[Session] = {
      val prev = if (agg.exists()) Some(agg.get()) else None
      var cur  = prev.getOrElse(SessAgg(0L, Long.MaxValue, Long.MinValue))
      rows.foreach { case (ts, _) =>
        val ms = ts.getTime
        cur = SessAgg(cur.n + 1, math.min(cur.startMs, ms), math.max(cur.endMs, ms))
      }
      agg.update(cur)
      // one timer per (possibly extended) session end, registered ONLY
      // when the end actually advanced — a key hot in every batch must
      // not write a timer per batch (nor re-register the same expiry
      // for late rows inside the window); earlier, now-stale timers are
      // filtered in handleExpiredTimer by expiry < end + gap
      if (!prev.exists(_.endMs == cur.endMs)) getHandle.registerTimer(cur.endMs + gapMs)
      Iterator.empty
    }

    override def handleExpiredTimer(key: String, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[Session] = {
      if (!agg.exists()) return Iterator.empty
      val cur = agg.get()
      if (expired.getExpiryTimeInMs() < cur.endMs + gapMs) Iterator.empty // stale: session extended
      else {
        agg.clear()
        Iterator.single(Session(key, cur.n, cur.startMs, cur.endMs))
      }
    }
  }

  /** Sessionize a watermarked (ts, user) stream; emits one row per
    * CLOSED session (watermark passed last event + gap).
    */
  def sessions(spark: SparkSession, input: Dataset[(java.sql.Timestamp, String)],
      gapMs: Long): Dataset[Session] = {
    import spark.implicits._
    input
      .groupByKey(_._2)
      .transformWithState(new SessionProcessor(gapMs), TimeMode.EventTime(), OutputMode.Append())
  }
}
