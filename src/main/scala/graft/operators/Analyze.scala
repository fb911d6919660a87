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

  /** Pearson correlation matrix over numeric columns in ONE scan — the
    * moment sums (Σx, Σx², Σxy for every pair) all come from a single
    * aggregation, so k columns cost one pass and k(k+1)/2 extra
    * multiply-adds per row, not k² scans.
    *
    * Numerics, in order of what goes wrong otherwise: built-in `corr`
    * accumulates doubles in partial-aggregation order
    * (non-deterministic under shuffle); and even with exact sums,
    * assembling `n·Sxy − Sx·Sy` in DOUBLE loses ~4 significant digits
    * to cancellation for weakly-correlated columns AND is
    * FMA-contraction-sensitive (a C++ engine fusing a·b−c·d rounds
    * differently from the JVM, measured as a 1-ulp drift vs DuckDB).
    * So everything up to and including that subtraction is exact
    * integer arithmetic: inputs quantized to 2-dp fixed point (cents —
    * exact for money/ratio domains), moments summed as decimal(38,0),
    * the numerator and both variance terms formed in integer space.
    * Only then does each exact integer take its ONE correctly-rounded
    * cast to double, and the remaining ops (sqrt, sqrt, ×, ÷) are
    * single IEEE operations — bit-identical on any engine, any cluster
    * size, any merge order. Digit budget: n·Σxy needs
    * digits(n)+digits(Σxy) ≤ 38, which holds through ~1e9 rows of
    * 1e7-cent values with room to spare.
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns to correlate")
    def c(name: String) =
      (col(name).cast("decimal(12,2)") * lit(100)).cast("decimal(38,0)")
    val pairs = for { i <- cols.indices; j <- cols.indices if i < j } yield (cols(i), cols(j))
    val aggs =
      Seq(count(lit(1)).cast("decimal(38,0)").as("__n")) ++
      cols.flatMap { x =>
        Seq(sum(c(x)).as(s"__s_$x"), sum(c(x) * c(x)).as(s"__ss_$x"))
      } ++
      pairs.map { case (x, y) => sum(c(x) * c(y)).as(s"__sp_${x}__$y") }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = pairs.map { case (x, y) =>
      val n   = col("__n")
      val num = (n * col(s"__sp_${x}__$y") - col(s"__s_$x") * col(s"__s_$y")).cast("double")
      val den = sqrt((n * col(s"__ss_$x") - col(s"__s_$x") * col(s"__s_$x")).cast("double")) *
        sqrt((n * col(s"__ss_$y") - col(s"__s_$y") * col(s"__s_$y")).cast("double"))
      struct(lit(x).as("col_x"), lit(y).as("col_y"), (num / den).as("corr"))
    }
    wide.select(explode(array(rows: _*)).as("s")).select("s.*")
  }
}
