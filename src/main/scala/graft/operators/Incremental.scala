package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — keep a materialized per-key
  * summary current by merging the day's delta batch into it, without
  * rescanning history.
  *
  * At 100 TB the history scan is the whole cost of a refresh; the
  * summary (one row per key) and the delta (one day of data) are both
  * orders of magnitude smaller. `summarize` produces an additive state
  * per key (count / sum / min / max — all commutative monoids, the same
  * shapes Spark's own partial aggregation buffers use); `merge`
  * re-aggregates `old ∪ summarize(delta)` — a shuffle over summary-sized
  * data only. `count` and decimal `sum` are exact under any merge order,
  * so daily incremental refresh is bit-equal to a full recompute (the
  * DuckDB oracle for `agg_incremental` IS the full recompute).
  *
  * avg is intentionally NOT a state column: it is derivable
  * (sum/count) and not additive — deriving at read time keeps every
  * state column mergeable.
  */
object Incremental {

  /** Additive per-key state: n, sum/min/max for each value column.
    * Value columns are decimal-cast so merge order cannot perturb sums.
    */
  def summarize(df: DataFrame, keys: Seq[String], valueCols: Seq[String]): DataFrame = {
    def dec(c: String): Column = col(c).cast("decimal(18,2)")
    val aggs = Seq(count(lit(1)).as("n")) ++ valueCols.flatMap { c =>
      Seq(sum(dec(c)).as(s"sum_$c"), min(dec(c)).as(s"min_$c"), max(dec(c)).as(s"max_$c"))
    }
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge two summaries with the same schema: one shuffle over
    * summary-sized inputs; map-side partial aggregation halves even that.
    */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String], valueCols: Seq[String]): DataFrame = {
    val aggs = Seq(sum(col("n")).as("n")) ++ valueCols.flatMap { c =>
      Seq(sum(col(s"sum_$c")).as(s"sum_$c"),
        min(col(s"min_$c")).as(s"min_$c"),
        max(col(s"max_$c")).as(s"max_$c"))
    }
    a.unionByName(b).groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Refresh: previously materialized summary + raw delta batch. */
  def refresh(oldSummary: DataFrame, delta: DataFrame,
              keys: Seq[String], valueCols: Seq[String]): DataFrame =
    merge(oldSummary, summarize(delta, keys, valueCols), keys, valueCols)

  /** Incremental JOIN view maintenance (classic delta rule for
    * append-only inputs): with A' = A ∪ dA and B' = B ∪ dB,
    *
    *   A' ⨝ B'  =  (A ⨝ B)  ∪  dA ⨝ B  ∪  A ⨝ dB  ∪  dA ⨝ dB
    *
    * so yesterday's materialized view is extended by three joins whose
    * cost is proportional to the CHURN, never a re-join of the full
    * inputs. Deltas are day-sized → Spark broadcasts them and the big
    * tables are probed in place (no full-table shuffle); at 100 TB this
    * is the difference between a refresh that reads two days of data
    * and one that reads two hundred terabytes. Exact for append-only
    * deltas (no retractions): every result row is produced exactly once
    * because the three delta terms partition the new pairs by which
    * side is new.
    */
  def joinDelta(oldA: DataFrame, oldB: DataFrame, dA: DataFrame, dB: DataFrame,
      joinExpr: Column): DataFrame =
    dA.join(broadcast(dB), joinExpr)
      // the DELTA side is always the broadcast build side; the big
      // stored tables are probed in place and never shuffle
      .unionByName(oldB.join(broadcast(dA), joinExpr))
      .unionByName(oldA.join(broadcast(dB), joinExpr))

  /** The refreshed view: yesterday's materialization plus the delta
    * terms. Column order must match the view's.
    */
  def refreshJoinView(view: DataFrame, oldA: DataFrame, oldB: DataFrame,
      dA: DataFrame, dB: DataFrame, joinExpr: Column): DataFrame =
    view.unionByName(joinDelta(oldA, oldB, dA, dB, joinExpr))
}
