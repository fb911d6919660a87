package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Corpus drift monitoring — "did the token mix shift between two
  * corpus slices?" (yesterday vs today, source A vs source B). The
  * canary a production training-data pipeline runs per ingest before a
  * bad batch contaminates a training mix.
  *
  * Scale shape: each slice collapses to a (token, count) table in one
  * hash aggregation — bounded by VOCABULARY, not corpus volume — then
  * one full-outer join on token and a bounded top-k. Slice totals ride
  * in as 1-row broadcast scalars. Per-token math is subtraction and
  * division only (no transcendental functions), so scores are
  * bit-reproducible across engines — the DuckDB oracle hash-matches the
  * drift values themselves, not just the token ranking.
  */
object Drift {

  private def tokenCounts(slice: DataFrame, textCol: String): DataFrame =
    slice.select(explode(TextFunctions.tokens(col(textCol))).as("token"))
      .where(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("cnt"))

  /** Top-k tokens by absolute share difference between two slices.
    * Output: (token, cnt_a, cnt_b, drift) — drift = |cnt_a/Σa − cnt_b/Σb|.
    */
  def tokenDrift(a: DataFrame, b: DataFrame, textCol: String, k: Int): DataFrame = {
    val ca = tokenCounts(a, textCol).withColumnRenamed("cnt", "cnt_a")
    val cb = tokenCounts(b, textCol).withColumnRenamed("cnt", "cnt_b")
    // an empty slice must read as "every token drifted by its full
    // share", not divide-by-null: clamp the total to ≥ 1 (counts are 0)
    val na = ca.agg(greatest(coalesce(sum(col("cnt_a")), lit(0L)), lit(1L)).as("__na"))
    val nb = cb.agg(greatest(coalesce(sum(col("cnt_b")), lit(0L)), lit(1L)).as("__nb"))
    ca.join(cb, Seq("token"), "full_outer")
      .na.fill(0L, Seq("cnt_a", "cnt_b"))
      .crossJoin(broadcast(na)).crossJoin(broadcast(nb))
      .withColumn("drift",
        abs(col("cnt_a").cast("double") / col("__na") - col("cnt_b").cast("double") / col("__nb")))
      .select("token", "cnt_a", "cnt_b", "drift")
      .orderBy(col("drift").desc, col("token"))
      .limit(k)
  }
}
