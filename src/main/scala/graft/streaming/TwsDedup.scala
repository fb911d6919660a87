package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Cross-batch streaming dedup on Spark 4's transformWithState — the
  * successor API to [[StatefulDedup.firstSeenOnly]]'s
  * flatMapGroupsWithState (which stays as the legacy-API coverage).
  * Environment note: this was blocked until round 9 by a container
  * RocksDB/chmod pipe deadlock (SURVEY §9); `graft.tools.TwsProbe`
  * re-validates the environment in seconds and now passes, so the
  * operator family is live.
  *
  * What the new API buys at 100 TB:
  *  - NATIVE STATE TTL (`TTLConfig`): the seen-registry evicts on
  *    processing-time age without hand-rolled timeout plumbing — state
  *    is bounded by the duplicate-arrival horizon, not stream length.
  *    flatMapGroupsWithState needed explicit timeout bookkeeping per
  *    key to get the same bound.
  *  - RocksDB-friendly: per-state-variable column families (vs one
  *    opaque blob per key), so a billion-key registry spills to local
  *    disk instead of executor heap.
  *
  * Dedup carries NO ordering requirement per key beyond first-wins, so
  * the single ValueState marker is exactly-once under the state store's
  * checkpointed batch versioning (same guarantee the spec pins across
  * restarts for the legacy operator).
  */
object TwsDedup {

  final case class Keyed(key: String, payload: String)

  /** Emit each key's row only the first time it is ever seen; a row
    * whose key was seen within `ttl` (or ever, for `TTLConfig.NONE`)
    * is dropped. TTL trades registry size for re-admission of
    * duplicates older than the horizon — the knob production dedup
    * always ends up needing.
    */
  final class FirstSeenProcessor(ttl: TTLConfig)
      extends StatefulProcessor[String, Keyed, Keyed] {
    @transient private var seen: org.apache.spark.sql.streaming.ValueState[Boolean] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean]("seen", Encoders.scalaBoolean, ttl)
    override def handleInputRows(key: String, rows: Iterator[Keyed],
        timers: TimerValues): Iterator[Keyed] = {
      if (seen.exists()) Iterator.empty
      else {
        seen.update(true)
        // also collapse duplicates WITHIN the batch: first row wins
        rows.take(1)
      }
    }
  }

  def firstSeenOnly(spark: SparkSession, input: Dataset[Keyed],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[Keyed] = {
    import spark.implicits._
    // a real TTL requires the processing-time clock; TTLConfig.NONE
    // runs clockless
    val timeMode = if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    input
      .groupByKey(_.key)
      .transformWithState(new FirstSeenProcessor(ttl), timeMode, OutputMode.Append())
  }
}
