package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval join WITHOUT an equi key — the join shape behind
  * time-window attribution, IP-range lookups, and genomic overlap.
  *
  * Spark's planner can only give this a nested-loop join (broadcast if
  * one side is small, else a full cartesian) because there is no
  * equality predicate to hash on: O(points × intervals) compares and a
  * hard memory wall. The scalable form quantizes the range dimension:
  *
  *  - each point maps to ONE bucket of width `w`: floor(p / w)
  *  - each interval explodes to the buckets it overlaps:
  *    sequence(floor(s/w), floor(e/w)) — ceil(len/w)+1 rows
  *  - equi-join on bucket (hash join, shuffles only bucket-tagged rows)
  *  - exact BETWEEN filter removes same-bucket near-misses
  *
  * Cost: O(points + intervals · len/w) shuffled rows — linear, tunable
  * by `w` (pick w ≈ median interval length: ~2 bucket rows per
  * interval). A matched pair appears exactly once (its point's single
  * bucket), so no dedup pass is needed. Skewed dimensions (a bucket
  * holding many points) are AQE-splittable because the join is a plain
  * hash join. At 100 TB this is the difference between a cartesian that
  * never finishes and two linear scans.
  */
object RangeJoin {

  /** Inner point-in-interval join on a numeric dimension.
    * `points(pointCol)` joined to `intervals[startCol, endCol]`
    * (inclusive bounds). All other columns from both sides survive.
    */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val b   = lit(bucketWidth)
    val pts = points.withColumn("_rj_bucket", floor(col(pointCol) / b))
    val ivs = intervals.withColumn("_rj_bucket",
      explode(sequence(floor(col(startCol) / b), floor(col(endCol) / b))))
    pts.join(ivs, "_rj_bucket")
      .where(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("_rj_bucket")
  }

  /** Timestamp flavor: buckets on epoch seconds, exact filter on the
    * original timestamps (no precision loss — the bucket is a routing
    * key only).
    */
  def pointInIntervalTs(points: DataFrame, pointCol: String,
                        intervals: DataFrame, startCol: String, endCol: String,
                        bucketWidthSec: Long): DataFrame = {
    require(bucketWidthSec > 0, "bucketWidthSec must be positive")
    val b   = lit(bucketWidthSec)
    def sec(c: Column) = unix_timestamp(c)
    val pts = points.withColumn("_rj_bucket", floor(sec(col(pointCol)) / b))
    val ivs = intervals.withColumn("_rj_bucket",
      explode(sequence(floor(sec(col(startCol)) / b), floor(sec(col(endCol)) / b))))
    pts.join(ivs, "_rj_bucket")
      .where(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("_rj_bucket")
  }
}
