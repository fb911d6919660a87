package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: two-phase salted aggregation. With heavily skewed
  * group keys (a handful of event types over billions of rows), a plain
  * groupBy sends each hot key to ONE reducer; salting fans each key out
  * over `saltBuckets` partial groups first, then combines partials —
  * both phases shuffle at most |keys|·salt rows. Decimal-typed aggregate
  * columns keep the result identical to the unsalted plan (exact,
  * order-independent), which is what the oracle checks.
  *
  * (AQE's skew-join handling covers joins; salting covers aggregation,
  * which AQE does not rebalance when the skew is in the group key.)
  */
object Skew {

  /** sum/count aggregation of `aggCol` by `keyCol`, salted. */
  def saltedSumCount(df: DataFrame, keyCol: String, aggCol: Column, saltBuckets: Int): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    salted
      .groupBy(col(keyCol), col("__salt"))
      .agg(sum(aggCol).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(keyCol))
      .agg(sum(col("__psum")).as("total"), sum(col("__pcnt")).as("n"))
  }

  /** Skew DIAGNOSIS: the top-k hottest keys with their row share — the
    * report that decides which keys need salting (or an AQE skew-join
    * hint) before a job ships. One hash aggregation (map-side partial,
    * bounded by key cardinality) + a bounded top-k; the total rides in
    * as a 1-row broadcast scalar.
    */
  def hotKeys(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    val total = df.agg(count(lit(1)).as("__total"))
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .select(col(keyCol), col("n"), (col("n").cast("double") / col("__total")).as("share"))
      .orderBy(col("n").desc, col(keyCol))
      .limit(k)
  }
}
