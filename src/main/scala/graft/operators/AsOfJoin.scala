package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left (probe) row, attach the latest
  * right (event) row with `rightTime <= leftTime` within the same
  * partition keys — the operator Spark's join zoo lacks (DuckDB spells
  * it ASOF JOIN; kdb calls it aj).
  *
  * Spark-first composition, no custom physical operator needed: tag and
  * union both sides, sort within partitions by (time, side), and
  * carry the last non-null right payload forward with
  * `last(_, ignoreNulls)` over an unbounded-preceding window; keep the
  * probe rows. ONE shuffle on the partition keys, no range cross
  * product — the plan a hand-written merge-join would produce. Events
  * sort before probes at equal timestamps, giving inclusive (<=)
  * semantics identical to ASOF JOIN.
  */
object AsOfJoin {

  /** @param left        probe side, one row per (partitionCols, leftTimeCol)
    * @param right       event side
    * @param partitionCols equality keys
    * @param leftTimeCol  probe timestamp column in `left`
    * @param rightTimeCol event timestamp column in `right`
    * @param payloadCols  right-side columns to attach (each emitted as `last_<name>`)
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      partitionCols: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      payloadCols: Seq[String]
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val tag      = "__is_probe"
    val t        = "__t"

    val probes = left
      .withColumn(tag, lit(1))
      .withColumn(t, col(leftTimeCol))
    val events = right
      .withColumn(tag, lit(0))
      .withColumn(t, col(rightTimeCol))

    // align schemas: union of both column sets, null-filled
    val union = SchemaMigration.migrate(
      events.select((partitionCols ++ payloadCols :+ tag :+ t).map(col): _*),
      probes.select((leftCols :+ tag :+ t).map(col).toIndexedSeq: _*)
    )

    val w = Window
      .partitionBy(partitionCols.map(col): _*)
      .orderBy(col(t), col(tag))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = payloadCols.foldLeft(union) { (df, c) =>
      df.withColumn(s"last_$c", last(col(c), ignoreNulls = true).over(w))
    }
    carried
      .filter(col(tag) === 1)
      .select((leftCols ++ payloadCols.map(c => s"last_$c")).map(col): _*)
  }
}
