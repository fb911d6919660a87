package graft.streaming

import graft.operators.Curation
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming DSIR admission gate: every arriving document micro-batch
  * is scored against FIXED offline-trained bucket models
  * ([[Curation.dsirScoreAgainst]] — no delta merge, so a document's
  * score is independent of batch boundaries), and only docs at or above
  * `minScore` continue to the target; rejects go to a reject sink with
  * their score attached for audit. The streaming twin of dsir_select:
  * selection by threshold instead of top-k, because a stream has no
  * "all rows" to rank over.
  *
  * Scale shape per micro-batch: the batch is materialized once, scoring
  * joins are broadcast (models are bucket-bounded), both routes filter
  * from the same scored frame, and epoch-keyed output directories make
  * foreachBatch replays idempotent (the QualityGate discipline).
  */
object DsirGate {

  final case class BatchSummary(batchId: Long, total: Long, admitted: Long)

  /** Route one materialized batch; exposed for batch backfills and the
    * spec — the streaming gate delegates here per micro-batch.
    */
  def routeBatch(batch: DataFrame, poolModel: DataFrame, targetModel: DataFrame,
      idCol: String, textCol: String, minScore: Double,
      targetDir: String, rejectDir: String, batchId: Long): BatchSummary = {
    val scored = batch.join(
        Curation.dsirScoreAgainst(poolModel, targetModel, batch, idCol, textCol)
          .select(col(idCol), col("dsir_score")),
        Seq(idCol), "left")
      // docs with no bigrams score null — reject them (nothing to judge)
      .persist()
    try {
      val admitted = scored.filter(col("dsir_score") >= minScore)
      val rejected = scored.filter(col("dsir_score").isNull || col("dsir_score") < minScore)
      admitted.write.mode("overwrite").parquet(s"$targetDir/epoch=$batchId")
      rejected.write.mode("overwrite").parquet(s"$rejectDir/epoch=$batchId")
      val row = scored.agg(count(lit(1)).as("__total"),
        sum(when(col("dsir_score") >= minScore, 1L).otherwise(0L)).as("__admitted")).collect()(0)
      BatchSummary(batchId, row.getAs[Long]("__total"),
        Option(row.get(row.fieldIndex("__admitted"))).map(_.asInstanceOf[Long]).getOrElse(0L))
    } finally scored.unpersist()
  }

  /** Attach the gate to a document stream. `onBatch` receives each
    * summary (the metrics-publisher seam).
    */
  def start(stream: DataFrame, poolModel: DataFrame, targetModel: DataFrame,
      idCol: String, textCol: String, minScore: Double,
      targetDir: String, rejectDir: String, checkpointDir: String,
      onBatch: BatchSummary => Unit = _ => ()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        onBatch(routeBatch(batch, poolModel, targetModel, idCol, textCol,
          minScore, targetDir, rejectDir, batchId))
      }
      .start()
}
