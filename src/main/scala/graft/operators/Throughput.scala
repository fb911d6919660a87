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

  /** The spec's `throughput.shaperImpl.memoryBound` block
    * (/root/reference/stream-spec-yaml-example.yaml:68-75). The
    * reference's shaper implementation lives in the external framework;
    * this is a documented stand-in with the same inputs and shape:
    * row bytes are estimated from the SCHEMA (strings/objects at the
    * configured fallback estimates), chunk cost is
    * `scale * (rowCountWeight + sizeWeight * sizeScaleFactor * rowMB)`
    * per row (size term in megabytes so the published example weights
    * produce sane chunk sizes), and the advice is the largest chunk
    * whose cost stays within `chunkCostMax`.
    */
  final case class MemoryBound(
      fallbackStringBytes: Int = 50,
      objectBytes: Int = 4096,
      chunkCostScale: Double = 1.0,
      chunkCostMax: Double = 10.0,
      rowCountWeight: Double = 0.05,
      sizeWeight: Double = 0.05,
      sizeScaleFactor: Double = 1.0
  )

  /** Static per-row byte estimate from the schema: fixed-width types at
    * their native width, strings/objects at the spec's estimates.
    */
  def estimateRowBytes(schema: org.apache.spark.sql.types.StructType, mb: MemoryBound): Long = {
    import org.apache.spark.sql.types._
    schema.fields.map(_.dataType match {
      case StringType                                       => mb.fallbackStringBytes.toLong
      case BinaryType | _: StructType | _: ArrayType | _: MapType => mb.objectBytes.toLong
      case t                                                => t.defaultSize.toLong
    }).sum
  }

  /** Advised rows per chunk under the memory-bound cost model; always
    * at least 1 so a single wide row still flows.
    */
  def memoryBoundChunkRows(schema: org.apache.spark.sql.types.StructType, mb: MemoryBound): Long = {
    val rowMb      = estimateRowBytes(schema, mb).toDouble / (1024 * 1024)
    val costPerRow = mb.chunkCostScale * (mb.rowCountWeight + mb.sizeWeight * mb.sizeScaleFactor * rowMb)
    math.max(1L, (mb.chunkCostMax / costPerRow).toLong)
  }
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
