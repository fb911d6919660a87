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

  /** SKETCHED hot-key detection: keys whose row share ≥ `threshold`,
    * found by a frequent-items sketch instead of [[hotKeys]]'s exact
    * per-key aggregation. The distinction matters exactly when salting
    * matters: at 100 TB with high key cardinality the exact diagnosis
    * pre-pass is itself a key-partitioned shuffle with the same hot
    * keys — the sketch pass merges fixed O(maxTracked) state instead,
    * no per-key exchange at all. The frequent-items guarantee is built
    * for this question: any key with share > 1/maxTracked is reported,
    * with count error ≤ n/maxTracked — so with maxTracked ≫ 1/threshold
    * no true hot key is missed.
    */
  def sketchHotKeys(df: DataFrame, keyCol: String, threshold: Double,
      maxTracked: Int = 1024): Seq[String] = {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1], got $threshold")
    require(maxTracked >= math.ceil(2.0 / threshold),
      s"maxTracked=$maxTracked too small for threshold=$threshold: need >= ${math.ceil(2.0 / threshold).toInt} so no hot key can be missed")
    val row = df.agg(
      expr(s"approx_top_k(CAST($keyCol AS STRING), ${math.min(maxTracked, 64)}, $maxTracked)").as("top"),
      count(lit(1)).as("total")).head()
    val total = row.getLong(1).toDouble
    if (total == 0) return Seq.empty
    row.getSeq[org.apache.spark.sql.Row](0)
      .filter(r => r.getLong(1) >= threshold * total)
      .map(_.getString(0))
  }

  /** [[saltedSumCount]] with the salt decision AUTOMATED by
    * [[sketchHotKeys]]: only keys the sketch flags as hot fan out over
    * `saltBuckets` partial groups; cold keys aggregate in one partial
    * as usual (salt 0), so the pre-combine width stays |cold| +
    * |hot|·salt instead of |keys|·salt. The result is EXACT either way
    * (decimal sums, order-independent) — the sketch only moves WORK,
    * never the answer, which is what the oracle checks.
    */
  def autoSaltedSumCount(df: DataFrame, keyCol: String, aggCol: Column,
      threshold: Double = 0.05, saltBuckets: Int = 32, maxTracked: Int = 1024): DataFrame = {
    val hot = sketchHotKeys(df, keyCol, threshold, maxTracked)
    val salt =
      if (hot.isEmpty) lit(0)
      else when(col(keyCol).cast("string").isInCollection(hot),
        pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
        .otherwise(lit(0))
    df.withColumn("__salt", salt)
      .groupBy(col(keyCol), col("__salt"))
      .agg(sum(aggCol).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(keyCol))
      .agg(sum(col("__psum")).as("total"), sum(col("__pcnt")).as("n"))
  }
}
