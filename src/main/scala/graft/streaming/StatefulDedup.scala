package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Cross-batch streaming deduplication with explicit keyed state
  * (`flatMapGroupsWithState`): emit each merge key's row only the first
  * time it is ever seen, across micro-batches. This is the arbitrary-
  * stateful-processing escape hatch the built-in `dropDuplicates` cannot
  * cover once custom retention/versioning rules enter (the reference's
  * upsert semantics live in exactly this layer when run continuously).
  *
  * State per key is a single seen-marker; with event-time timeout the
  * state store stays bounded by the active key horizon, not the stream
  * length.
  */
object StatefulDedup {

  final case class Keyed(key: String, payload: String)

  def firstSeenOnly(spark: SparkSession, input: Dataset[Keyed]): Dataset[Keyed] = {
    import spark.implicits._
    input
      .groupByKey(_.key)
      .flatMapGroupsWithState[Boolean, Keyed](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[Keyed], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            rows.take(1)
          }
      }
  }

  /** Watermark-bounded streaming dedup: duplicates arriving within the
    * event-time watermark horizon are dropped with BOUNDED state — the
    * engine evicts keys once the watermark passes them, so state size is
    * governed by the lateness bound, not stream length. The right choice
    * for high-cardinality keys where `firstSeenOnly`'s forever-registry
    * would grow without bound; the scale default for dedup of an
    * ingestion stream.
    */
  def dedupWithinWatermark(
      input: org.apache.spark.sql.DataFrame, eventTimeCol: String, keyCols: Seq[String], delay: String
  ): org.apache.spark.sql.DataFrame =
    input
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)
}
