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

  test("gapFill materializes zero rows for silent buckets, spans per key, never pads outside") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // key 1: active weeks of Jan 1 and Jan 22 → two silent weeks between;
    // key 2: one active week → no padding at all
    val df = Seq(
      (1L, t("2024-01-02 10:00:00")), (1L, t("2024-01-03 11:00:00")),
      (1L, t("2024-01-24 09:00:00")),
      (2L, t("2024-02-07 00:00:00"))
    ).toDF("k", "ts")
    val got = TimeSeries.gapFill(df, "k", "ts", stepDays = 7)
      .orderBy("k", "bucket")
      .as[(Long, java.sql.Date, Long)].collect().toList
      .map { case (k, d, n) => (k, d.toString, n) }
    assert(got == List(
      (1L, "2024-01-01", 2L), (1L, "2024-01-08", 0L),
      (1L, "2024-01-15", 0L), (1L, "2024-01-22", 1L),
      (2L, "2024-02-05", 1L)
    ), s"gap fill wrong: $got")
  }

  test("rollingStats: frames include the filled zeros; delta and mean hand-checked") {
    def week(i: Int, j: Int) =
      new java.sql.Timestamp(java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime +
        i * 7L * 86400000L + j * 3600000L)
    // weeks 0,1,3 active (counts 2,4,6); week 2 silent → zero row that
    // MUST enter week 3's trailing frame
    val rows = for ((i, c) <- Seq((0, 2), (1, 4), (3, 6)); j <- 0 until c) yield (1L, week(i, j))
    val got = TimeSeries.rollingStats(rows.toDF("k", "ts"), "k", "ts", k = 2)
      .orderBy("bucket")
      .select("n_events", "delta", "roll_sum", "roll_buckets", "roll_mean")
      .as[(Long, Option[Long], Long, Long, Double)].collect().toList
    assert(got == List(
      (2L, None, 2L, 1L, 2.0),          // first bucket: no delta, frame of 1
      (4L, Some(2L), 6L, 2L, 3.0),
      (0L, Some(-4L), 4L, 2L, 2.0),     // the filled zero week
      (6L, Some(6L), 6L, 2L, 3.0)       // frame = (0, 6), NOT (4, 6)
    ), s"rolling stats wrong: $got")
  }

  test("anomalies flags the planted spike and the silent-week outage, integer-exact at the boundary") {
    def week(i: Int, j: Int) = // event j in week i (weeks start Mon 2024-01-01)
      new java.sql.Timestamp(java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime +
        i * 7L * 86400000L + j * 3600000L)
    // key 10: 9 events/week for 6 weeks but week 4 SILENT → the zero
    //   week (from gap-fill) is the outage anomaly: dev²=2025 > 4·405
    // key 20: 5/week then a 50-spike: dev²=50625 > 4·10125
    // key 30: exact 2σ boundary (5,5,5,5,50): dev²=32400 == 4·8100 →
    //   NOT flagged (strict >) — the integer form makes the tie exact
    val rows =
      (for (i <- Seq(0, 1, 2, 3, 5); j <- 0 until 9) yield (10L, week(i, j))) ++
      (for (i <- 0 to 5; j <- 0 until (if (i == 5) 50 else 5)) yield (20L, week(i, j))) ++
      (for (i <- 0 to 4; j <- 0 until (if (i == 4) 50 else 5)) yield (30L, week(i, j)))
    val df = rows.toDF("k", "ts")
    val got = TimeSeries.anomalies(df, "k", "ts", kNum = 2L, kDen = 1L)
      .select("k", "n_events").as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 0L), (20L, 50L)), s"anomaly set wrong: $got")
  }

  test("rolling actives HLL twin: approx_count_distinct tracks exact on the cover frame") {
    // the 100 TB path for q_rolling_active swaps count_distinct for the
    // mergeable HLL sketch on the SAME explode-cover frame; pin that
    // the swap is drop-in and the estimate lands inside a loose band
    // (rsd 2% → 10% test bound leaves no flake room)
    val wk = Tables(spark, sfDir).events
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("week"))
      .distinct()
    val cover = wk.select(col("user_id"), explode(expr(
      "sequence(week, week + interval '21' day, interval '7' day)")).as("week"))
    val exact = cover.groupBy(col("week")).agg(count_distinct(col("user_id")).as("x"))
    val hll   = cover.groupBy(col("week")).agg(approx_count_distinct(col("user_id"), 0.02).as("a"))
    val rows = exact.join(hll, Seq("week")).select("x", "a").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (x, a) =>
      assert(math.abs(a - x).toDouble / x < 0.1, s"HLL estimate $a too far from exact $x")
    }
  }

  test("plan: one series-key shuffle for extraction, bounded TakeOrdered for top-k") {
    val plan = physicalPlan(
      TimeSeries.similarTopK(ts, Seq("series"), Seq("pos"), "value", pattern, k = 2))
    val shuffles = plan.collect { case e: ShuffleExchangeLike => e }
    assert(shuffles.size <= 2, s"expected at most window+TakeOrdered exchanges, got ${shuffles.size}")
    assert(plan.collect { case t: TakeOrderedAndProjectExec => t }.nonEmpty,
      "top-k must plan as TakeOrderedAndProject, not a global sort")
  }

  test("peakConcurrency: inclusive ends, touching sessions concurrent, cross-day peaks attributed correctly") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val intervals = Seq(
      // day 1: [10:00, 11:00], [10:30, 12:00], [11:00, 11:10] → 3 live at 11:00
      (ts("2024-03-01 10:00:00"), ts("2024-03-01 11:00:00")),
      (ts("2024-03-01 10:30:00"), ts("2024-03-01 12:00:00")),
      (ts("2024-03-01 11:00:00"), ts("2024-03-01 11:10:00")),
      // one session spanning midnight into day 2, overlapping another
      (ts("2024-03-01 23:00:00"), ts("2024-03-02 01:00:00")),
      (ts("2024-03-02 00:30:00"), ts("2024-03-02 02:00:00"))
    ).toDF("st", "en")
    val got = TimeSeries.peakConcurrency(intervals, "st", "en")
      .orderBy("day").as[(java.sql.Timestamp, Long)].collect().toSeq
    // day 1 peak: 3 (at 11:00 the ending and starting sessions overlap
    // inclusively); day 2 peak: 2 (00:30–01:00, only boundary points in
    // day 2 count toward its max — the carried-over live count appears
    // at the 00:30 start point)
    assert(got == Seq(
      (ts("2024-03-01 00:00:00"), 3L),
      (ts("2024-03-02 00:00:00"), 2L)), s"got $got")
  }
}
