package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables for co-located joins: writing both fact tables
  * bucketed by the join key lets every subsequent join/aggregation on
  * that key run with ZERO shuffle — the dominant cost at 100 TB when the
  * same key is joined repeatedly (orders⨝lineitem on orderkey in every
  * report). The write pays one shuffle once; each later join saves one.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on the bucket key (shuffle-free —
    * asserted in BucketingSpec).
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
