package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis: how many users complete step 1, then step 2
  * strictly after it, then step 3 … — the product-analytics staple over
  * an event stream. Greedy first-match per step is optimal (matching
  * the earliest qualifying event for step k never forecloses a later
  * step, since any completion using a later step-k event is also a
  * completion using the earliest one), so the result is identical to
  * the declarative "min ts after previous step" chain the oracle runs.
  *
  * Spark-first shape: ONE shuffle of the step-typed events on the user
  * key. Each user's qualifying events are gathered sorted
  * (`sort_array(collect_list)` — map-side combined, bounded by that
  * user's step-typed events only, not the full stream), and a single
  * `aggregate` fold walks them once, carrying (depth, last-ts): an
  * event advances the funnel iff it is the next step's type and
  * strictly later than the previous step's match. The per-user state
  * is two scalars; the final step histogram is a 4-row rollup. A
  * window/self-join formulation would shuffle the stream once PER STEP
  * — this does it once total, which is the difference that matters at
  * 100 TB.
  *
  * Output: (step, step_name, n_users) — users whose funnel depth
  * reached at least that step, so n_users is non-increasing in step.
  */
object Funnel {
  /** Per-user matched step timestamps: `step_ts[i]` is the time the
    * user completed step i+1 (array length = funnel depth reached).
    * The greedy fold walks each user's sorted step-typed events once;
    * conjunct order matters — `size < steps` guards the `element_at`
    * into the step list, and the null `last` check guards the strict
    * ordering test (Spark's And/Or evaluate left-to-right).
    */
  def stepTimes(
      events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      steps: Seq[String]
  ): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val stepArr = array(steps.map(lit): _*)
    events
      .filter(col(typeCol).isin(steps: _*))
      .select(col(userCol).as("__u"),
        struct(col(tsCol).as("ts"), col(typeCol).as("et")).as("__e"))
      .groupBy(col("__u"))
      .agg(sort_array(collect_list(col("__e"))).as("__es"))
      .select(col("__u"),
        aggregate(
          col("__es"),
          // (matched step timestamps so far, timestamp of the last match)
          struct(array().cast("array<timestamp>").as("a"),
            lit(null).cast("timestamp").as("t")),
          (st, e) => {
            val advance = size(st.getField("a")) < lit(steps.size) &&
              e.getField("et") === element_at(stepArr, size(st.getField("a")) + 1) &&
              (st.getField("t").isNull || e.getField("ts") > st.getField("t"))
            struct(
              when(advance, concat(st.getField("a"), array(e.getField("ts"))))
                .otherwise(st.getField("a")).as("a"),
              when(advance, e.getField("ts")).otherwise(st.getField("t")).as("t"))
          },
          st => st.getField("a")
        ).as("step_ts"))
  }

  /** Skew-safe alternative to [[stepTimes]]: one pass of
    * filter → per-user `min` → join PER STEP, never a per-user event
    * list. The fold gathers each user's step events into one task's
    * row, so a pathologically hot key (a bot with millions of step
    * events) makes that task the straggler; here every pass is a
    * map-side-combined `min` aggregation — immune to key skew — at the
    * cost of scanning the step-typed stream once per step. Greedy
    * first-match equals the min-after-previous chain (see
    * [[stepCounts]]), so the two are result-identical
    * (property-tested); pick by skew profile.
    */
  def stepTimesChained(
      events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      steps: Seq[String]
  ): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val f = events.filter(col(typeCol).isin(steps: _*))
      .select(col(userCol).as("__u"), col(typeCol).as("__et"), col(tsCol).as("__ts"))
    var acc = f.filter(col("__et") === steps.head)
      .groupBy(col("__u")).agg(min(col("__ts")).as("__t1"))
    for (i <- 2 to steps.size) {
      val next = f.filter(col("__et") === steps(i - 1))
        .join(acc.select(col("__u"), col(s"__t${i - 1}")), Seq("__u"))
        .filter(col("__ts") > col(s"__t${i - 1}"))
        .groupBy(col("__u")).agg(min(col("__ts")).as(s"__t$i"))
      acc = acc.join(next, Seq("__u"), "left")
    }
    // t_i is null only if every later t is null too → the non-null
    // prefix is the matched chain, same shape stepTimes returns
    acc.select(col("__u"),
      filter(array((1 to steps.size).map(i => col(s"__t$i")): _*),
        t => t.isNotNull).as("step_ts"))
  }

  def stepCounts(
      events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      steps: Seq[String]
  ): DataFrame = {
    val depths = stepTimes(events, userCol, typeCol, tsCol, steps)
      .select(col("__u"), size(col("step_ts")).as("__depth"))

    // tiny rollup: depth histogram → "reached at least step k" counts;
    // every declared step gets a row (0 when nobody reached it), so the
    // output shape is the funnel definition, not the data
    val reached = depths.filter(col("__depth") >= 1)
      .groupBy(col("__depth")).agg(count(lit(1)).as("__n"))
      .select(explode(sequence(lit(1), col("__depth"))).as("step"), col("__n"))
      .groupBy(col("step")).agg(sum(col("__n")).as("n_reached"))
    val spark = events.sparkSession
    import spark.implicits._
    steps.zipWithIndex.map { case (s, i) => (i + 1, s) }.toDF("step", "step_name")
      .join(reached, Seq("step"), "left")
      .select(col("step").cast("int").as("step"), col("step_name"),
        coalesce(col("n_reached"), lit(0L)).cast("long").as("n_users"))
  }

  /** First-order Markov transition matrix of the event stream: counts of
    * (event → next event) per user in (tsCol, tieCol) order. One
    * user-keyed window (lead) pairs each event with its successor; the
    * final aggregate is |types|²-bounded and map-side combines, so at
    * 100 TB the cost is exactly one shuffle on userCol.
    */
  def transitionMatrix(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    events
      .select(col(userCol), col(typeCol).as("from_type"),
        lead(col(typeCol), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
  }

  /** Last-touch revenue attribution: each `convType` event credits the
    * user's most recent PRECEDING non-conversion event type, or
    * 'direct' when none exists. The touch is carried forward by ONE
    * rows-frame `last_value(ignoreNulls)` window — no per-conversion
    * re-join of the stream — and revenue sums in exact cents
    * (round(value·100) as long) so the aggregate is order-independent.
    */
  def lastTouchAttribution(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, tieCol: String, valueCol: String, convType: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("__touch",
        last(when(col(typeCol) =!= convType, col(typeCol)), ignoreNulls = true).over(w))
      .filter(col(typeCol) === convType)
      .groupBy(coalesce(col("__touch"), lit("direct")).as("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(round(col(valueCol) * 100).cast("long")).as("revenue_cents"))
  }
}
