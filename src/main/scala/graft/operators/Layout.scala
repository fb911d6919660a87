package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftShim}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout (Z-order clustering) — the file-level
  * organization that makes min/max data skipping work for MORE THAN ONE
  * predicate column at once.
  *
  * Sorting 100 TB by `l_partkey` gives perfect skipping on partkey
  * filters and none on suppkey; interleaving the bits of both keys
  * (Morton/Z-value) gives every file a small extent in BOTH dimensions,
  * so either predicate prunes ~sqrt-fashion.
  *
  * Raw interleave has a well-known failure mode: if one key's domain is
  * wider (more bits) than the other's, every high z-bit comes from the
  * wide key and the layout degenerates to a single-key sort. So both
  * dimensions are first NORMALIZED to a fixed `bits`-bit grid from their
  * domain bounds — at 100 TB those bounds come from table statistics,
  * not a scan. All grid math is exact integer arithmetic (verified
  * bit-equal against DuckDB's `//` floor-division in the oracle), and
  * the z-value itself is a pure shift/mask/add over built-ins —
  * whole-stage-codegen'd, no UDF. Layout is `repartitionByRange(z)` +
  * in-partition sort: one range shuffle, the cost of a plain sort.
  */
object Layout {

  /** Scale a column to [0, 2^bits) from precomputed domain bounds:
    * (c−mn)·(2^bits−1) div span, computed EXACTLY for the full long
    * domain. The numerator is widened to decimal(38,0) (≤ 2^63·2^31 <
    * 10^38, always representable) and divided with Catalyst's
    * `IntegralDivide` — the same integer `//` quotient the DuckDB oracle
    * computes, with no double rounding step. A plain double-division
    * floor is only exact while the numerator stays under 2^53; wide
    * domains (epoch-micros keys span ~2^50 already) silently diverge
    * from the oracle there, so exactness is not left to a precondition.
    * Assumes mn ≤ c (domain bounds from table stats); for non-negative
    * operands the truncating `div` equals floor.
    */
  def toGrid(c: Column, mn: Column, mx: Column, bits: Int): Column = {
    val cells = lit((1L << bits) - 1).cast("decimal(38,0)")
    val span  = greatest(mx.cast("long") - mn.cast("long"), lit(1L))
    val num   = (c.cast("long") - mn.cast("long")).cast("decimal(38,0)") * cells
    GraftShim.column(IntegralDivide(
      GraftShim.expression(num),
      GraftShim.expression(span.cast("decimal(38,0)"))))
  }

  /** Morton z-value: interleave the low `bits` bits of two non-negative
    * integer columns (x gets even bit positions, y odd). Bit positions
    * are disjoint, so plain addition assembles the word — the same
    * formula is expressible verbatim in ANSI SQL for the oracle.
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1,31] (two lanes in one long)")
    val xl = x.cast("long"); val yl = y.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** The same interleave as ANSI SQL text (oracle parity). */
  def zValueSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  /** k-column Morton interleave: bit `i` of column `j` lands at
    * position `i·k + j` (round-robin lanes; for k=2 this is exactly
    * [[zValue]]). Real layouts cluster 3–4 predicate columns; the same
    * normalize-then-interleave rule applies — every column must first
    * be gridded to `bits` bits or the widest domain swallows the high
    * z-bits.
    */
  def zValueN(cols: Seq[Column], bits: Int): Column = {
    val k = cols.size
    require(k >= 2 && k * bits <= 62, s"need 2+ columns and k*bits <= 62 (got k=$k bits=$bits)")
    val terms = for { j <- 0 until k; i <- 0 until bits }
      yield shiftleft(shiftright(cols(j).cast("long"), i).bitwiseAND(lit(1L)), i * k + j)
    terms.reduce(_ + _)
  }

  /** The k-column interleave as ANSI SQL text (oracle parity). */
  def zValueNSql(cols: Seq[String], bits: Int): String = {
    val k = cols.size
    (for { j <- cols.indices; i <- 0 until bits }
      yield s"(((${cols(j)} >> $i) & 1) << ${i * k + j})").mkString(" + ")
  }

  /** Normalized k-column z-value over a frame (see [[withZ]]). */
  def withZN(df: DataFrame, colNames: Seq[String], bits: Int): DataFrame = {
    val aggs = colNames.flatMap(c =>
      Seq(min(c).cast("long").as(s"_mn_$c"), max(c).cast("long").as(s"_mx_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val grids = colNames.map(c => toGrid(col(c), col(s"_mn_$c"), col(s"_mx_$c"), bits))
    df.crossJoin(broadcast(stats))
      .withColumn("_z", zValueN(grids, bits))
      .drop(colNames.flatMap(c => Seq(s"_mn_$c", s"_mx_$c")): _*)
  }

  /** Per-bucket extent summary over k clustered columns. */
  def bucketExtentsN(df: DataFrame, colNames: Seq[String], bits: Int,
                     bucketShift: Int): DataFrame =
    withZN(df, colNames, bits)
      .groupBy(shiftright(col("_z"), bucketShift).as("bucket"))
      .agg(count(lit(1)).as("n"),
        colNames.flatMap(c => Seq(min(c).as(s"min_$c"), max(c).as(s"max_$c"))): _*)

  /** Normalized z-value over a frame: domain bounds via one tiny
    * aggregate broadcast-cross-joined onto the rows (a scalar, not a
    * shuffle; production would read them from table stats instead).
    */
  def withZ(df: DataFrame, xCol: String, yCol: String, bits: Int): DataFrame = {
    val stats = df.agg(
      min(xCol).cast("long").as("_mnx"), max(xCol).cast("long").as("_mxx"),
      min(yCol).cast("long").as("_mny"), max(yCol).cast("long").as("_mxy"))
    df.crossJoin(broadcast(stats))
      .withColumn("_z", zValue(
        toGrid(col(xCol), col("_mnx"), col("_mxx"), bits),
        toGrid(col(yCol), col("_mny"), col("_mxy"), bits), bits))
      .drop("_mnx", "_mxx", "_mny", "_mxy")
  }

  /** Cluster `df` for two-column skipping and write it: range-partition
    * by z-value (sampled bounds — balanced files even under skew), sort
    * within partitions so parquet row-group stats are tight, drop the
    * helper column on disk.
    */
  def zorderWrite(df: DataFrame, xCol: String, yCol: String, bits: Int,
                  numFiles: Int, dir: String): Unit =
    withZ(df, xCol, yCol, bits)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(dir)

  /** Per-bucket extent summary (bucket ≈ file): the min/max ranges a
    * reader would skip on. With `bucketShift = bits`, each bucket keeps
    * the top bits/2 grid bits of BOTH dimensions → extents ≈
    * domain / 2^(bits/2) in each. Small output regardless of input size.
    */
  def bucketExtents(df: DataFrame, xCol: String, yCol: String, bits: Int,
                    bucketShift: Int): DataFrame =
    withZ(df, xCol, yCol, bits)
      .groupBy(shiftright(col("_z"), bucketShift).as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(xCol).as("min_x"), max(xCol).as("max_x"),
        min(yCol).as("min_y"), max(yCol).as("max_y"))
}
