package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins: for each left (probe) row, attach the nearest right
  * (event) row in time within the same partition keys — the operator
  * Spark's join zoo lacks (DuckDB spells it ASOF JOIN; kdb calls it aj;
  * pandas merge_asof adds direction and tolerance, mirrored here).
  *
  * Spark-first composition, no custom physical operator needed: tag and
  * union both sides, sort within partitions by (time, side), and
  * carry the last non-null right payload forward with
  * `last(_, ignoreNulls)` over an unbounded-preceding window; keep the
  * probe rows. ONE shuffle on the partition keys, no range cross
  * product — the plan a hand-written merge-join would produce. Events
  * sort before probes at equal timestamps, giving inclusive semantics
  * identical to ASOF JOIN.
  */
object AsOfJoin {

  /** Latest event with `rightTime <= leftTime` (DuckDB `ASOF JOIN ...
    * ON e.ts <= p.ts`; pandas direction="backward").
    *
    * @param left        probe side, one row per (partitionCols, leftTimeCol)
    * @param right       event side
    * @param partitionCols equality keys
    * @param leftTimeCol  probe timestamp column in `left`
    * @param rightTimeCol event timestamp column in `right`
    * @param payloadCols  right-side columns to attach (each emitted as `last_<name>`)
    * @param tolerance    optional bound on `leftTime - eventTime` (an
    *                     interval for timestamps, a number for numeric
    *                     times); matches farther back are nulled out,
    *                     like pandas merge_asof's tolerance
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      partitionCols: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      payloadCols: Seq[String],
      tolerance: Option[Column] = None
  ): DataFrame =
    joinAsOf(left, right, partitionCols, leftTimeCol, rightTimeCol, payloadCols,
      tolerance, forwardDir = false, prefix = "last_")

  /** Earliest event with `rightTime >= leftTime` (pandas
    * direction="forward"); payloads emitted as `next_<name>`.
    * `tolerance` bounds `eventTime - leftTime`.
    */
  def forward(
      left: DataFrame,
      right: DataFrame,
      partitionCols: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      payloadCols: Seq[String],
      tolerance: Option[Column] = None
  ): DataFrame =
    joinAsOf(left, right, partitionCols, leftTimeCol, rightTimeCol, payloadCols,
      tolerance, forwardDir = true, prefix = "next_")

  /** Closest event in EITHER direction (pandas direction="nearest");
    * ties — probe equidistant from its latest-preceding and
    * earliest-following events — resolve backward (the state that was
    * already in effect). Payloads emitted as `near_<name>`; `tolerance`
    * bounds the absolute gap.
    *
    * Still ONE shuffle: both directions are windows over the same
    * partition keys, so the plan is a single exchange with two in-place
    * sorted passes (asc for the backward carry, desc for the forward) —
    * NOT a self-join of two as-of results, which would shuffle three
    * times.
    */
  def nearest(
      left: DataFrame,
      right: DataFrame,
      partitionCols: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      payloadCols: Seq[String],
      tolerance: Option[Column] = None
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val (union, tag, t, eventT) =
      tagAndUnion(left, right, partitionCols, leftTimeCol, rightTimeCol, payloadCols)

    def w(ord: Column) = Window
      .partitionBy(partitionCols.map(col): _*)
      .orderBy(ord, col(tag))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wBack = w(col(t).asc)
    val wFwd  = w(col(t).desc)

    val carryCols = payloadCols :+ eventT
    val carried = carryCols.foldLeft(union) { (df, c) =>
      df.withColumn(s"__b_$c", last(col(c), ignoreNulls = true).over(wBack))
        .withColumn(s"__f_$c", last(col(c), ignoreNulls = true).over(wFwd))
    }
    val backGap = col(t) - col(s"__b_$eventT")
    val fwdGap  = col(s"__f_$eventT") - col(t)
    val backOk = col(s"__b_$eventT").isNotNull &&
      tolerance.map(backGap <= _).getOrElse(lit(true))
    val fwdOk = col(s"__f_$eventT").isNotNull &&
      tolerance.map(fwdGap <= _).getOrElse(lit(true))
    val pickBack = backOk && (!fwdOk || backGap <= fwdGap)
    carried
      .filter(col(tag) === 1)
      .select((leftCols.map(col) ++
        payloadCols.map(c =>
          when(pickBack, col(s"__b_$c"))
            .when(fwdOk, col(s"__f_$c"))
            .otherwise(lit(null)).as(s"near_$c"))): _*)
  }

  private def joinAsOf(
      left: DataFrame,
      right: DataFrame,
      partitionCols: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      payloadCols: Seq[String],
      tolerance: Option[Column],
      forwardDir: Boolean,
      prefix: String
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val (union, tag, t, eventT) =
      tagAndUnion(left, right, partitionCols, leftTimeCol, rightTimeCol, payloadCols)

    // backward: scan time ascending, carry the latest preceding event.
    // forward: scan time DESCENDING, so "last event seen" is the
    // earliest following one. Events sort before probes at equal time
    // in both directions (inclusive <= / >=).
    val ord = if (forwardDir) col(t).desc else col(t).asc
    val w = Window
      .partitionBy(partitionCols.map(col): _*)
      .orderBy(ord, col(tag))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carryCols = payloadCols :+ eventT
    val carried = carryCols.foldLeft(union) { (df, c) =>
      df.withColumn(s"$prefix$c", last(col(c), ignoreNulls = true).over(w))
    }
    // tolerance: null the attachment when the matched event is farther
    // than `tolerance` from the probe (the carried event time measures
    // the gap; no extra shuffle — one more projected comparison)
    val gapOk: Column = tolerance match {
      case None => lit(true)
      case Some(tol) =>
        val gap = if (forwardDir) col(s"$prefix$eventT") - col(t) else col(t) - col(s"$prefix$eventT")
        col(s"$prefix$eventT").isNotNull && gap <= tol
    }
    carried
      .filter(col(tag) === 1)
      .select((leftCols.map(col) ++
        payloadCols.map(c => when(gapOk, col(s"$prefix$c")).otherwise(lit(null)).as(s"$prefix$c"))): _*)
  }

  /** Tag probes/events and union them schema-aligned; returns the union
    * and the (tag, time, eventTime) helper column names.
    */
  private def tagAndUnion(
      left: DataFrame,
      right: DataFrame,
      partitionCols: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      payloadCols: Seq[String]
  ): (DataFrame, String, String, String) = {
    val leftCols = left.columns.toSeq
    val tag      = "__is_probe"
    val t        = "__t"
    val eventT   = "__event_t"

    val probes = left
      .withColumn(tag, lit(1))
      .withColumn(t, col(leftTimeCol))
    val events = right
      .withColumn(tag, lit(0))
      .withColumn(t, col(rightTimeCol))
      .withColumn(eventT, col(rightTimeCol)) // null on probes post-union

    // align schemas: union of both column sets, null-filled
    val union = SchemaMigration.migrate(
      events.select((partitionCols ++ payloadCols :+ eventT :+ tag :+ t).map(col): _*),
      probes.select((leftCols :+ tag :+ t).map(col).toIndexedSeq: _*)
    )
    (union, tag, t, eventT)
  }
}
