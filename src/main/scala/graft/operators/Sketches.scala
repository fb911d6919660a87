package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (Datasketches HLL, built into Spark
  * 3.5+). The operator every 100 TB cardinality question wants:
  *
  *  - [[approxDistinct]] — one aggregation pass, fixed ~KB state per
  *    group regardless of cardinality (exact countDistinct shuffles
  *    every distinct value; several in one aggregate Expand the input
  *    N×, see Analyze.columnStats).
  *  - [[partialSketches]] / [[mergeSketches]] — the re-aggregation
  *    pattern: persist per-(group, shard) sketches once — e.g. per day,
  *    per source, per ingest batch — then answer any coarser rollup by
  *    UNIONING sketch bytes, never rescanning the corpus. Sketch union
  *    is associative and commutative, so rollups compose across
  *    partitions, files, and days.
  *
  * Estimates are deterministic for a given input (no RNG at query time);
  * relative error is ~1.04/sqrt(2^lgK) — about 1.6% at the default
  * lgK=12, with 4 KB of state per group.
  */
object Sketches {

  /** Approximate distinct `valueCol` per `groupCols` in one pass. */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String, lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_sketch_agg(col(valueCol), lit(lgK))).as("approx_ndv"))

  /** Per-(group, shard) sketch bytes — the precomputed partial. */
  def partialSketches(
      df: DataFrame, groupCols: Seq[String], shardCols: Seq[String], valueCol: String, lgK: Int = 12
  ): DataFrame =
    df.groupBy((groupCols ++ shardCols).map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))

  /** Roll partial sketches up to `groupCols` by sketch union — no
    * rescan of the underlying data.
    */
  def mergeSketches(partials: DataFrame, groupCols: Seq[String], sketchCol: String = "sketch"): DataFrame =
    partials.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col(sketchCol))).as("approx_ndv"))

  /** Approximate heavy hitters per group (DataSketches frequent-items,
    * a Spark 4.1 built-in aggregate): top `k` values of `valueCol` with
    * estimated counts, fixed O(maxItemsTracked) state per group. When
    * `maxItemsTracked` ≥ the group's distinct count the sketch never
    * evicts and counts are EXACT — the regime the oracle-gated query
    * runs in; below that, counts are lower bounds with error ≤
    * n/maxItemsTracked (the classic frequent-items guarantee).
    */
  def approxTopK(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int, maxItemsTracked: Int): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(expr(s"approx_top_k($valueCol, $k, $maxItemsTracked)").as("top_items"))

  /** Per-(group, shard) frequent-items sketch — the precomputed partial
    * (same persist-once/rollup-anywhere pattern as [[partialSketches]]).
    */
  def partialTopK(df: DataFrame, groupCols: Seq[String], shardCols: Seq[String],
      valueCol: String, maxItemsTracked: Int): DataFrame =
    df.groupBy((groupCols ++ shardCols).map(col): _*)
      .agg(expr(s"approx_top_k_accumulate($valueCol, $maxItemsTracked)").as("sketch"))

  /** Roll partial frequent-items sketches up to `groupCols` by sketch
    * combine, then extract the top `k` — no rescan of the corpus.
    */
  def mergeTopK(partials: DataFrame, groupCols: Seq[String], k: Int,
      maxItemsTracked: Int, sketchCol: String = "sketch"): DataFrame =
    partials.groupBy(groupCols.map(col): _*)
      .agg(expr(
        s"approx_top_k_estimate(approx_top_k_combine($sketchCol, $maxItemsTracked), $k)"
      ).as("top_items"))

  import graft.plans.KllExpressions._

  /** Per-group quantiles through a KLL sketch (DataSketches, the
    * third mergeable-sketch family — see [[graft.plans.KllSketchAgg]]).
    * One aggregation pass, fixed O(k) state per group; while a group's
    * count ≤ k the sketch retains every value and the INCLUSIVE-rule
    * quantiles are EXACT order statistics (the oracle-gated regime);
    * beyond that, normalized rank error ~1.65% at k=200.
    */
  def approxQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
      probs: Seq[Double], k: Int = 200): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(kllSketchAgg(col(valueCol), k).as("sketch"))
      .select(groupCols.map(col) ++ Seq(
        kllN(col("sketch")).as("n"),
        kllQuantiles(col("sketch"), array(probs.map(lit): _*)).as("quantiles")): _*)

  /** Per-(group, shard) KLL sketch bytes — the persisted partial
    * (per day / per source / per ingest batch), same pattern as
    * [[partialSketches]].
    */
  def partialQuantileSketches(df: DataFrame, groupCols: Seq[String],
      shardCols: Seq[String], valueCol: String, k: Int = 200): DataFrame =
    df.groupBy((groupCols ++ shardCols).map(col): _*)
      .agg(kllSketchAgg(col(valueCol), k).as("sketch"))

  /** Roll partial KLL sketches up to `groupCols` by sketch union and
    * extract quantiles — no rescan of the underlying data. Union is
    * associative + commutative, so day→month→year rollups chain.
    */
  def mergeQuantileSketches(partials: DataFrame, groupCols: Seq[String],
      probs: Seq[Double], k: Int = 200, sketchCol: String = "sketch"): DataFrame =
    partials.groupBy(groupCols.map(col): _*)
      .agg(kllUnionAgg(col(sketchCol), k).as("merged"))
      .select(groupCols.map(col) ++ Seq(
        kllN(col("merged")).as("n"),
        kllQuantiles(col("merged"), array(probs.map(lit): _*)).as("quantiles")): _*)

  /** Join-key overlap diagnostics from two HLL sketches — the
    * pre-flight a planner (or an engineer sizing a shuffle) wants
    * before joining two 100 TB tables: distinct keys on each side, in
    * the union, and (by inclusion–exclusion) in the INTERSECTION, i.e.
    * how many keys will actually match. Each side is one aggregation to
    * ~KB of sketch state; no join, no shuffle of either table. Estimate
    * error compounds across the subtraction (≈3× the single-sketch
    * bound in the worst case — spec-asserted), which is the right
    * trade: the answer sizes a plan, it doesn't need to BE the plan.
    */
  def joinKeyOverlap(a: DataFrame, aKey: String, b: DataFrame, bKey: String,
      lgK: Int = 12): DataFrame = {
    val sa = a.agg(hll_sketch_agg(col(aKey), lit(lgK)).as("sk_a"))
    val sb = b.agg(hll_sketch_agg(col(bKey), lit(lgK)).as("sk_b"))
    sa.crossJoin(broadcast(sb))
      .select(
        hll_sketch_estimate(col("sk_a")).as("ndv_a"),
        hll_sketch_estimate(col("sk_b")).as("ndv_b"),
        hll_sketch_estimate(hll_union(col("sk_a"), col("sk_b"))).as("ndv_union"))
      .withColumn("ndv_intersect",
        greatest(col("ndv_a") + col("ndv_b") - col("ndv_union"), lit(0L)))
  }

  /** Equi-depth range-partition boundaries from ONE KLL pass: the
    * numParts−1 split points at ranks i/numParts — what
    * `repartitionByRange` estimates with a row sample, derived instead
    * from a mergeable sketch, so boundaries for TOMORROW's layout job
    * can come from unioning yesterday's persisted per-shard sketches
    * without a corpus scan. Exact order statistics while n ≤ k (the
    * oracle-gated regime); rank error ≤ the sketch bound beyond —
    * either way each emitted boundary is a REAL value from the column
    * domain. Output: (part 1..numParts−1, split_at).
    */
  def rangeSplitPoints(df: DataFrame, valueCol: String, numParts: Int, k: Int = 32768): DataFrame = {
    require(numParts >= 2, s"numParts must be >= 2, got $numParts")
    val probs = (1 until numParts).map(_.toDouble / numParts)
    df.agg(kllSketchAgg(col(valueCol), k).as("sketch"))
      .select(posexplode(kllQuantiles(col("sketch"), array(probs.map(lit): _*))).as(Seq("i", "split_at")))
      .select((col("i") + 1).as("part"), col("split_at"))
  }
}
