package graft.streaming

import graft.operators.DataQuality
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** In-stream validation gate — the reference rejects malformed rows
  * before the sink commit; here the batch [[DataQuality.Check]] rules
  * run per micro-batch inside `foreachBatch`: failing rows are routed
  * to a quarantine sink (with the list of failed checks attached, so
  * quarantine is debuggable), passing rows continue to the target, and
  * a per-batch violation summary feeds the metrics callback.
  *
  * Scale shape: the micro-batch is persisted once and BOTH routes
  * filter from that one materialization — no double source read; the
  * summary is a per-check `sum(when)` aggregation on the same cached
  * batch. Checkpointed `foreachBatch` keeps the route exactly-once per
  * epoch: a replayed batch overwrites by epoch directory, never
  * double-appends.
  */
object QualityGate {

  final case class BatchSummary(batchId: Long, total: Long, quarantined: Long,
      perCheck: Map[String, Long])

  /** Route one (already materialized) batch; returns the summary.
    * Exposed for direct reuse in batch backfills — the streaming gate
    * delegates here per micro-batch.
    */
  def routeBatch(batch: DataFrame, checks: Seq[DataQuality.Check],
      targetDir: String, quarantineDir: String, batchId: Long): BatchSummary = {
    val failed = array(checks.map(c => when(c.violated, lit(c.name))): _*)
    val tagged = batch.withColumn("__failed_checks", array_compact(failed)).persist()
    try {
      val bad  = tagged.filter(size(col("__failed_checks")) > 0)
      val good = tagged.filter(size(col("__failed_checks")) === 0).drop("__failed_checks")
      // epoch-keyed directories make foreachBatch replays idempotent
      good.write.mode("overwrite").parquet(s"$targetDir/epoch=$batchId")
      bad.withColumn("__failed_checks", concat_ws(",", col("__failed_checks")))
        .write.mode("overwrite").parquet(s"$quarantineDir/epoch=$batchId")

      val aggs = checks.map(c => sum(when(c.violated, 1L).otherwise(0L)).as(c.name)) :+
        count(lit(1)).as("__total") :+
        sum(when(size(col("__failed_checks")) > 0, 1L).otherwise(0L)).as("__quarantined")
      val row = tagged.agg(aggs.head, aggs.tail: _*).collect()(0)
      BatchSummary(batchId,
        row.getAs[Long]("__total"),
        row.getAs[Long]("__quarantined"),
        checks.map(c => c.name -> row.getAs[Long](c.name)).toMap)
    } finally tagged.unpersist()
  }

  /** Attach the gate to a stream. `onBatch` receives each batch summary
    * (the metrics-publisher seam).
    */
  def start(stream: DataFrame, checks: Seq[DataQuality.Check],
      targetDir: String, quarantineDir: String, checkpointDir: String,
      onBatch: BatchSummary => Unit = _ => ()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        onBatch(routeBatch(batch, checks, targetDir, quarantineDir, batchId))
      }
      .start()
}
