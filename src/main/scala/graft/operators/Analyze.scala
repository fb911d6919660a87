package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE, the reference's `targetAnalyzeSettings`
  * (/root/reference/stream-spec-yaml-example.yaml:59-61): collect
  * per-column statistics of the target table after enough batches.
  *
  * `exact=false` (the 100 TB default) computes every column's stats in
  * ONE aggregation pass — single scan, HyperLogLog ndv. `exact=true`
  * (the oracle gate) needs exact ndv; multiple exact countDistincts in
  * one aggregate would Expand the input N× through the shuffle, so the
  * exact path instead unions N independent single-column aggregations:
  * each branch's parquet scan prunes to just its column, the branches
  * schedule concurrently, and no Expand ever materializes.
  */
object Analyze {
  def columnStats(df: DataFrame, cols: Seq[String], exact: Boolean = false): DataFrame =
    if (exact) {
      val perCol = cols.map { c =>
        df.select(col(c))
          .agg(
            count(col(c)).as("n_non_null"),
            countDistinct(col(c)).as("ndv"),
            min(col(c)).cast("string").as("min_value"),
            max(col(c)).cast("string").as("max_value")
          )
          .select(lit(c).as("column"), col("n_non_null"), col("ndv"), col("min_value"), col("max_value"))
      }
      perCol.reduce(_.unionAll(_))
    } else {
      val aggs = cols.flatMap { c =>
        Seq(
          count(col(c)).as(s"${c}__n_non_null"),
          approx_count_distinct(col(c)).as(s"${c}__ndv"),
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
