package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE, the reference's `targetAnalyzeSettings`
  * (/root/reference/stream-spec-yaml-example.yaml:59-61): collect
  * per-column statistics of the target table after enough batches.
  *
  * One aggregation pass computes all columns' stats simultaneously
  * (single scan, no per-column jobs). `exact=false` (the 100 TB path)
  * uses HyperLogLog ndv (approx_count_distinct); `exact=true` computes
  * exact ndv for the oracle gate.
  */
object Analyze {
  def columnStats(df: DataFrame, cols: Seq[String], exact: Boolean = false): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__n_non_null"),
        (if (exact) countDistinct(col(c)) else approx_count_distinct(col(c))).as(s"${c}__ndv"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max")
      )
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // unpivot to one row per column
    val rows = cols.map { c =>
      struct(
        lit(c).as("column"),
        col(s"${c}__n_non_null").as("n_non_null"),
        col(s"${c}__ndv").as("ndv"),
        col(s"${c}__min").as("min_value"),
        col(s"${c}__max").as("max_value")
      )
    }
    wide.select(explode(array(rows: _*)).as("s")).select("s.*")
  }
}
