package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed time-series subsequence similarity search — the
  * streaming-data similarity problem of the retrieved corpus (EDBT 2019
  * "Time Series Similarity Search for Streaming Data in Distributed
  * Systems"; ICDE 2021 REPOSE does the same top-k shape with trie
  * pruning).
  *
  * The Spark-first decomposition:
  *
  *  1. subsequence EXTRACTION is one window pass per series — a ROWS
  *     frame of length L collecting the trailing values, no self-join
  *     (the naive "join positions i..i+L" shape shuffles the series L
  *     times; the frame shuffles it once, on the series key);
  *  2. DISTANCE is a per-row higher-order fold over the (subsequence,
  *     literal-pattern) pair — codegen'd, no UDF;
  *  3. TOP-K is a bounded `TakeOrderedAndProject`, never a global sort.
  *
  * Arithmetic is EXACT: values are fixed-point (2 decimals), so both
  * sides work in integer cents and the squared distance is a plain
  * integer — reproducible across engines, partitionings, and runs (a
  * double fold's result depends on accumulation order; an integer's
  * does not). The scale path beyond brute-force-per-window is the ANN
  * machinery over these subsequence vectors (CentroidCells /
  * HyperplaneBuckets index the L-dim cents vectors exactly like
  * embeddings) — this operator produces those vectors.
  */
object TimeSeries {

  /** value → exact integer cents (2-decimal fixed point). */
  private def cents(c: Column): Column = round(c * 100).cast("long")

  /** Sliding subsequences of `length` trailing values per series:
    * (seriesCols*, orderCols*, window: array<long>) — only full windows
    * are emitted. One shuffle (on the series key), frame order fixed by
    * `orderCols`, values as exact cents.
    */
  def subsequences(df: DataFrame, seriesCols: Seq[String], orderCols: Seq[String],
      valueCol: String, length: Int): DataFrame = {
    require(length >= 2, s"subsequence length must be >= 2, got $length")
    val w = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-(length - 1), Window.currentRow)
    df.withColumn("window", collect_list(cents(col(valueCol))).over(w))
      .where(size(col("window")) === length)
      .select((seriesCols ++ orderCols).map(col) :+ col("window"): _*)
  }

  /** Top-k subsequences most similar to `pattern` (squared Euclidean
    * distance in cents², ascending; ties broken on the series/order
    * columns for a deterministic result set).
    */
  def similarTopK(df: DataFrame, seriesCols: Seq[String], orderCols: Seq[String],
      valueCol: String, pattern: Seq[Double], k: Int): DataFrame = {
    val L   = pattern.length
    val pat = array(pattern.map(v => lit(math.round(v * 100))): _*)
    val sub = subsequences(df, seriesCols, orderCols, valueCol, L)
    val d   = aggregate(
      zip_with(col("window"), pat, (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)
    sub.withColumn("dist_cents2", d)
      .orderBy(col("dist_cents2") +: (seriesCols ++ orderCols).map(col): _*)
      .limit(k)
      .select((seriesCols ++ orderCols).map(col) :+ col("dist_cents2"): _*)
  }
}
