package graft

import graft.operators.TimeSeries
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  // two series; series 1 contains the exact pattern at positions 3..6
  private val pattern = Seq(1.0, 2.0, 3.0, 4.0)
  private lazy val ts = Seq(
    (1L, 1L, 9.0), (1L, 2L, 9.0), (1L, 3L, 1.0), (1L, 4L, 2.0),
    (1L, 5L, 3.0), (1L, 6L, 4.0), (1L, 7L, 9.0),
    (2L, 1L, 1.0), (2L, 2L, 2.0), (2L, 3L, 3.0), (2L, 4L, 4.1)
  ).toDF("series", "pos", "value")

  test("subsequences: trailing frames only, exact cents, in order") {
    val subs = TimeSeries.subsequences(ts, Seq("series"), Seq("pos"), "value", length = 4)
      .orderBy("series", "pos")
      .as[(Long, Long, Seq[Long])].collect().toSeq
    // first full window ends at pos 4; values are cents in frame order
    assert(subs.head == ((1L, 4L, Seq(900L, 900L, 100L, 200L))))
    assert(subs.count(_._1 == 1L) == 4 && subs.count(_._1 == 2L) == 1)
    assert(subs.find(s => s._1 == 1L && s._2 == 6L).get._3 == Seq(100L, 200L, 300L, 400L))
  }

  test("similarTopK: exact match first with distance 0, near match second with exact integer distance") {
    val top = TimeSeries.similarTopK(ts, Seq("series"), Seq("pos"), "value", pattern, k = 2)
      .as[(Long, Long, Long)].collect().toSeq
    // series 1 pos 6 is the planted exact match; series 2 pos 4 differs
    // by 0.1 in the last element → (10 cents)² = 100
    assert(top == Seq((1L, 6L, 0L), (2L, 4L, 100L)))
  }

  test("plan: one series-key shuffle for extraction, bounded TakeOrdered for top-k") {
    val plan = physicalPlan(
      TimeSeries.similarTopK(ts, Seq("series"), Seq("pos"), "value", pattern, k = 2))
    val shuffles = plan.collect { case e: ShuffleExchangeLike => e }
    assert(shuffles.size <= 2, s"expected at most window+TakeOrdered exchanges, got ${shuffles.size}")
    assert(plan.collect { case t: TakeOrderedAndProjectExec => t }.nonEmpty,
      "top-k must plan as TakeOrderedAndProject, not a global sort")
  }
}
