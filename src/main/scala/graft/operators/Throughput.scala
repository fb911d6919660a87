package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Memory-bound throughput shaping, the reference's
  * `ThroughputShaperBuilder` with the `memoryBound` settings
  * (/root/reference/stream-spec-yaml-example.yaml:68-80): estimate the
  * byte cost of a row from observed string sizes, then advise how many
  * rows fit a chunk budget and how many chunks a table needs.
  *
  * In Spark the same knob is `maxFilesPerTrigger` / `maxBytesPerTrigger`
  * on the streaming source (see sources/BlobListingSource); this operator
  * computes the advice deterministically so it is oracle-checkable.
  */
object Throughput {
  /** Per-group chunk advice. `stringCols` contribute measured byte sizes;
    * `fixedBytesPerRow` covers the fixed-width columns.
    */
  def chunkAdvice(
      df: DataFrame,
      groupCol: String,
      stringCols: Seq[String],
      fixedBytesPerRow: Long,
      chunkBudgetBytes: Long
  ): DataFrame = {
    val measured = stringCols.map(c => sum(octet_length(col(c)))).reduce(_ + _)
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"), measured.as("string_bytes"))
      .withColumn("est_row_bytes", expr(s"string_bytes DIV n_rows + $fixedBytesPerRow"))
      .withColumn("chunk_rows", greatest(lit(1L), expr(s"$chunkBudgetBytes DIV est_row_bytes")))
      .withColumn("n_chunks", expr("CAST(ceil(CAST(n_rows AS DOUBLE) / chunk_rows) AS BIGINT)"))
      .orderBy(col(groupCol))
  }
}
