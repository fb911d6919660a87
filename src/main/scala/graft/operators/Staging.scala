package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Staging: group rows into batches capped at `maxRowsPerFile`, the
  * reference's `StagingProcessor` + `staging.table.maxRowsPerFile`
  * (/root/reference/stream-spec-yaml-example.yaml:13).
  *
  * Production write path: Spark's `option("maxRecordsPerFile", n)` caps
  * rows per output file natively with zero extra shuffle — that is what
  * `writeStaged` uses and what the streaming sink uses. The
  * `batchAccounting` query exists for the correctness gate: it assigns
  * deterministic batch ids via a global row_number, which is a
  * verification artifact (single-partition window), not the scale path.
  */
object Staging {
  def writeStaged(df: DataFrame, dir: String, maxRowsPerFile: Int): Unit =
    df.write.mode("overwrite").option("maxRecordsPerFile", maxRowsPerFile.toLong).parquet(dir)

  /** Deterministic batch accounting: batch id per `maxRows` rows in
    * `orderCol` order, with per-batch stats.
    */
  def batchAccounting(df: DataFrame, orderCol: String, maxRows: Int): DataFrame = {
    val w = Window.orderBy(col(orderCol))
    df.withColumn("rn", row_number().over(w) - 1)
      .withColumn("batch_id", expr(s"CAST(rn DIV $maxRows AS BIGINT)"))
      .groupBy("batch_id")
      .agg(
        count(lit(1)).as("n_rows"),
        min(col(orderCol)).as("min_key"),
        max(col(orderCol)).as("max_key")
      )
      .orderBy("batch_id")
  }
}
