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

  /** Calendar gap-filling (resampling to a regular grid): per-key
    * bucket counts with the MISSING buckets materialized as explicit
    * zero rows between each key's first and last active bucket — what
    * a downstream trend/seasonality/rolling model needs and what a
    * plain GROUP BY silently omits (absence-of-row ≠ zero).
    *
    * Scale shape: the count aggregation is calendar-bounded per key
    * (map-side combined); spans are an aggregation OF that (one row
    * per key); the calendar explode is bounded by span length, never
    * event volume; and the final (key, bucket) left join shuffles
    * frames that are both calendar-sized. Event volume is touched
    * exactly once, in the first aggregation.
    */
  def gapFill(df: DataFrame, keyCol: String, tsCol: String, stepDays: Int = 7): DataFrame = {
    require(stepDays > 0, "stepDays must be positive")
    val bucket =
      if (stepDays == 7) date_trunc("week", col(tsCol)).cast("date")
      else to_date(lit("1970-01-01")) + (datediff(col(tsCol).cast("date"),
        to_date(lit("1970-01-01"))) / stepDays).cast("int") * stepDays
    val counts = df.select(col(keyCol), bucket.as("bucket"))
      .groupBy(col(keyCol), col("bucket")).agg(count(lit(1)).as("n_events"))
    val cal = counts.groupBy(col(keyCol))
      .agg(min(col("bucket")).as("__b0"), max(col("bucket")).as("__b1"))
      .select(col(keyCol), explode(expr(s"sequence(__b0, __b1, interval $stepDays days)")).as("bucket"))
    cal.join(counts, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"), coalesce(col("n_events"), lit(0L)).as("n_events"))
  }

  /** Rolling trend statistics over the gap-filled series: k-bucket
    * trailing sum/mean and the bucket-over-bucket delta per key. The
    * zeros from [[gapFill]] are load-bearing — without them a k-bucket
    * ROWS frame silently spans a gap and the "trailing 4 weeks" sum is
    * really 4 ACTIVE weeks, inflating every trend over sparse keys.
    * Mean = exact-long rolling sum over the in-frame bucket count (one
    * division); delta is a lag subtraction — no float accumulation
    * anywhere. One window pass (both frames share the per-key
    * partitioning and bucket ordering).
    */
  def rollingStats(df: DataFrame, keyCol: String, tsCol: String,
      k: Int = 4, stepDays: Int = 7): DataFrame = {
    require(k >= 1, "window must span at least one bucket")
    import org.apache.spark.sql.expressions.Window
    val order = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
    val frame = order.rowsBetween(-(k - 1), Window.currentRow)
    gapFill(df, keyCol, tsCol, stepDays)
      .withColumn("delta", col("n_events") - lag(col("n_events"), 1).over(order))
      .withColumn("roll_sum", sum(col("n_events")).over(frame))
      .withColumn("roll_buckets", count(lit(1)).over(frame))
      .withColumn("roll_mean",
        col("roll_sum").cast("double") / col("roll_buckets"))
  }

  /** Per-key z-score outliers over the gap-filled series, in
    * INTEGER-EXACT form: with n buckets, sum s and sum-of-squares q
    * per key, `|x − mean| > k·σ` for rational k = kNum/kDen is
    * algebraically `kDen²·(n·x − s)² > kNum²·(n·q − s²)` — every term
    * a long, so the flagged SET is hash-exact on any engine, where a
    * float mean/stddev pipeline can flip a borderline bucket in the
    * last ulp. Gap-filling first matters: silent weeks enter the
    * baseline as real zeros (and can themselves be the anomaly — an
    * outage IS a zero week).
    *
    * Scale shape: one tiny per-key stats aggregate joined back
    * (broadcastable — one row per key), then a pure filter; the series
    * is scanned once past [[gapFill]].
    */
  def anomalies(
      df: DataFrame, keyCol: String, tsCol: String,
      kNum: Long = 2L, kDen: Long = 1L, stepDays: Int = 7, minBuckets: Int = 4
  ): DataFrame = {
    require(kNum > 0 && kDen > 0, "threshold must be a positive rational")
    val filled = gapFill(df, keyCol, tsCol, stepDays)
    val stats = filled.groupBy(col(keyCol)).agg(
      count(lit(1)).as("__n"),
      sum(col("n_events")).as("__s"),
      sum(col("n_events") * col("n_events")).as("__q"))
    val dev = col("__n") * col("n_events") - col("__s")          // n·x − s
    val varNum = col("__n") * col("__q") - col("__s") * col("__s") // n·q − s²
    filled.join(stats, Seq(keyCol))
      .filter(col("__n") >= minBuckets &&
        lit(kDen * kDen) * dev * dev > lit(kNum * kNum) * varNum)
      .select(col(keyCol), col("bucket"), col("n_events"),
        dev.as("dev_num"), varNum.as("var_num"), col("__n").as("n_buckets"))
  }

  /** Peak concurrency per day — the sweep-line classic (max sessions
    * simultaneously active), distributed: intervals become ±1 boundary
    * points; a GLOBAL running sum over (ts, +1 before −1) is the live
    * count at every boundary; the per-day max of that count is the
    * answer. Ends are INCLUSIVE: sessions touching at a timestamp
    * count as concurrent (the +1-first tie order implements exactly
    * that), and a day's peak is attributed to the day the peak occurs.
    *
    * The global running sum is NOT an unpartitioned window: boundary
    * points partition by a DETERMINISTIC range key (the hour bucket of
    * ts — recomputable on task retry or executor loss, unlike
    * spark_partition_id, and needing no lineage checkpoint), each
    * bucket cumsums locally, and bucket prefix offsets come from one
    * window over the tiny per-bucket totals frame (one row per hour —
    * ~90k rows per decade, a single-partition sort that never touches
    * the data scale). Equal-ts points share an hour bucket by
    * construction, so tie order is respected. Intervals with a null
    * start or end carry no sweep information and are filtered up front
    * (they previously produced a null day row whose ordering is
    * engine-dependent).
    */
  def peakConcurrency(intervals: DataFrame, startCol: String, endCol: String): DataFrame = {
    val live = intervals.filter(col(startCol).isNotNull && col(endCol).isNotNull)
    val points = live.select(col(startCol).as("__ts"), lit(1L).as("__d"))
      .unionAll(live.select(col(endCol).as("__ts"), lit(-1L).as("__d")))
      .withColumn("__bucket", date_trunc("hour", col("__ts")))
    val cum = points.withColumn("__cum", sum(col("__d")).over(
      Window.partitionBy("__bucket").orderBy(col("__ts"), col("__d").desc)))
    val wOff = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = points.groupBy("__bucket").agg(sum(col("__d")).as("__t"))
      .withColumn("__off", coalesce(sum(col("__t")).over(wOff), lit(0L)))
      .select("__bucket", "__off")
    cum.join(broadcast(offsets), Seq("__bucket"))
      .withColumn("__live", col("__off") + col("__cum"))
      .groupBy(date_trunc("day", col("__ts")).as("day"))
      .agg(max(col("__live")).as("peak_concurrency"))
  }
}
