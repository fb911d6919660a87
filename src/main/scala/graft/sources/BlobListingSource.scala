package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned blob listing source — the reference's
  * `BlobListingParquetSource` + `DefaultS3Reader`
  * (/root/reference/src/main/scala/main.scala:74-78): list parquet blobs
  * under a prefix, use each blob's modification time as its version, and
  * only read blobs strictly newer than the current watermark.
  *
  * Uses the Hadoop FileSystem API, so the same code lists `file://`,
  * `hdfs://` or `s3a://` prefixes (the reference is S3-only). Listing is
  * driver-side metadata only — the data itself is read by executors via
  * the normal distributed parquet scan over the selected paths. For
  * continuous operation, `graft.streaming.StreamPipeline` uses Spark's
  * file streaming source, which performs this same listing incrementally
  * with `maxFilesPerTrigger` as the rate limiter (the reference's
  * throughput shaping).
  */
object BlobListingSource {

  final case class Blob(path: String, name: String, sizeBytes: Long, modifiedMs: Long)

  /** All parquet blobs under `prefix`, sorted by (modifiedMs, name).
    * `retry` bounds transient listing failures (the reference's source S3
    * `retryMaxAttempts`/`retryBaseDelay`/`retryMaxDelay`).
    */
  def listBlobs(
      spark: SparkSession, prefix: String,
      retry: graft.streaming.RetryPolicy = graft.streaming.RetryPolicy.Never
  ): Seq[Blob] = graft.streaming.Retry.withRetry(retry) {
    val p  = new Path(prefix)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else
      fs.listStatus(p)
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(s => Blob(s.getPath.toString, s.getPath.getName, s.getLen, s.getModificationTime))
        .sortBy(b => (b.modifiedMs, b.name))
        .toSeq
  }

  /** Blobs strictly newer than `watermarkMs` (the stored stream version). */
  def newBlobs(spark: SparkSession, prefix: String, watermarkMs: Long): Seq[Blob] =
    listBlobs(spark, prefix).filter(_.modifiedMs > watermarkMs)

  /** Read all blobs newer than the watermark as one DataFrame. */
  def readNewBlobs(spark: SparkSession, prefix: String, watermarkMs: Long): Option[DataFrame] = {
    val paths = newBlobs(spark, prefix, watermarkMs).map(_.path)
    if (paths.isEmpty) None else Some(spark.read.parquet(paths: _*))
  }

  /** The watermark after consuming `blobs`: max modification time seen. */
  def nextWatermark(blobs: Seq[Blob], current: Long): Long =
    (current +: blobs.map(_.modifiedMs)).max
}
