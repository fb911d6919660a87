package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Target-table maintenance, the reference's `TargetMaintenanceProcessor`
  * with `targetOptimizeSettings.fileSizeThreshold`
  * (/root/reference/stream-spec-yaml-example.yaml:49-61).
  *
  * Compaction = read the (many small) files and rewrite into
  * ceil(inputBytes / targetFileBytes) files via `repartition` — the Spark
  * equivalent of Iceberg OPTIMIZE. The repartition is a round-robin
  * shuffle sized by actual input bytes, so output files land near the
  * target size regardless of input skew. Snapshot/orphan expiration are
  * table-format concerns (Iceberg/Delta `expire_snapshots` /
  * `remove_orphan_files`); with plain parquet dirs the rewrite itself
  * supersedes old files atomically via overwrite.
  */
object Maintenance {
  def targetFileCount(inputBytes: Long, targetFileBytes: Long): Int =
    math.max(1, math.ceil(inputBytes.toDouble / targetFileBytes).toInt)

  def compact(spark: SparkSession, inputDir: String, outputDir: String, targetFileBytes: Long): DataFrame = {
    val df    = spark.read.parquet(inputDir)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val n     = targetFileCount(bytes.min(BigInt(Long.MaxValue)).toLong, targetFileBytes)
    df.repartition(n).write.mode("overwrite").parquet(outputDir)
    spark.read.parquet(outputDir)
  }
}
