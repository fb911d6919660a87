package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated TPC-H-ish tables in a scale-factor
  * directory (see TESTDATA.md). One parquet file per table at test SFs;
  * in production each would be a partitioned directory — the readers
  * below do not assume single-file inputs.
  */
final class Tables(spark: SparkSession, sfDir: String) {
  private def t(name: String): DataFrame = Tables.cachedRead(spark, s"$sfDir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** `events.ts` has shipped as both TIMESTAMP(NANOS) and
    * TIMESTAMP(MICROS) parquet across testdata generations, so branch on
    * the loaded dtype rather than assuming one encoding:
    *  - NANOS: Spark cannot decode it natively; read as raw int64 nanos
    *    (nanosAsLong) and truncate to microseconds — exactly what DuckDB
    *    does for TIMESTAMP_NS (truncation, not rounding), so both engines
    *    agree bit-for-bit.
    *  - MICROS (isAdjustedToUTC=false → TIMESTAMP_NTZ): cast to
    *    TimestampType. The session timezone is pinned UTC
    *    (GraftSession), so the cast is a wall-clock identity and the
    *    downstream column type matches the nanos path.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.normalizeEventsTs(t("events"))
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  def apply(spark: SparkSession, sfDir: String): Tables = new Tables(spark, sfDir)

  // Lazy-DataFrame reuse per (session, path): every registered query
  // calls spark.read.parquet on its tables, and each call re-infers the
  // schema from a footer read plus a fresh relation resolution — pure
  // metadata overhead multiplied by the 229-entry bench board. The
  // cached object is a LAZY plan (no data, no results — each query
  // still computes from the parquet bytes); keying by session through a
  // WeakHashMap lets a stopped session (test suites build dozens) be
  // collected instead of pinning its relations.
  private val readCache =
    new java.util.WeakHashMap[SparkSession, java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()

  private def cachedRead(spark: SparkSession, path: String): DataFrame = {
    val perSession = readCache.synchronized {
      var m = readCache.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
        readCache.put(spark, m)
      }
      m
    }
    perSession.computeIfAbsent(path, p => spark.read.parquet(p))
  }

  /** Normalize the `ts` column of an events frame (batch or streaming) to
    * TimestampType regardless of which parquet encoding the data shipped
    * with — see [[Tables.events]] for the per-encoding rationale. Works
    * on any DataFrame whose schema is already resolved (for streaming
    * readers, pass the reader's declared schema through this same
    * branch).
    */
  def normalizeEventsTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer DIV: double division would lose precision above 2^53 ns
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000L")))
      case org.apache.spark.sql.types.TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
}
