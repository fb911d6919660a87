package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated TPC-H-ish tables in a scale-factor
  * directory (see TESTDATA.md). One parquet file per table at test SFs;
  * in production each would be a partitioned directory — the readers
  * below do not assume single-file inputs.
  */
final class Tables(spark: SparkSession, sfDir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark cannot decode
    * natively. Read it as raw int64 nanos and truncate to microseconds —
    * exactly what DuckDB does when it reads TIMESTAMP_NS (verified:
    * truncation, not rounding), so both engines agree bit-for-bit.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t("events")
    // integer DIV: a double division would lose precision above 2^53 ns
    raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000L")))
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  def apply(spark: SparkSession, sfDir: String): Tables = new Tables(spark, sfDir)
}
