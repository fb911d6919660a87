package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Funnel

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel enforces strict step order; greedy fold matches the hand-traced truth") {
    val steps = Seq("signup", "view", "purchase")
    val events = Seq(
      // user 1 completes all three in order
      (1L, "signup", ts("2024-01-01 00:00:00")),
      (1L, "view", ts("2024-01-01 01:00:00")),
      (1L, "purchase", ts("2024-01-01 02:00:00")),
      // user 2: purchase BEFORE view — depth stops at view
      (2L, "signup", ts("2024-01-01 00:00:00")),
      (2L, "purchase", ts("2024-01-01 00:30:00")),
      (2L, "view", ts("2024-01-01 01:00:00")),
      // user 3: view only, never signed up — depth 0, not in output
      (3L, "view", ts("2024-01-01 00:00:00")),
      // user 4: same-ts view as the signup — strict > rejects it, the
      // later view counts
      (4L, "signup", ts("2024-01-01 00:00:00")),
      (4L, "view", ts("2024-01-01 00:00:00")),
      (4L, "view", ts("2024-01-01 00:10:00")),
      // user 5: greedy trap — earliest view still leaves a purchase
      (5L, "signup", ts("2024-01-01 00:00:00")),
      (5L, "view", ts("2024-01-01 00:05:00")),
      (5L, "purchase", ts("2024-01-01 00:06:00"))
    ).toDF("user_id", "event_type", "ts")

    val got = Funnel.stepCounts(events, "user_id", "event_type", "ts", steps)
      .orderBy("step").as[(Int, String, Long)].collect().toList
    // reached ≥1: users 1,2,4,5; ≥2: 1,2,4,5 (2's view is after signup); ≥3: 1,5
    assert(got == List((1, "signup", 4L), (2, "view", 4L), (3, "purchase", 2L)),
      s"funnel counts wrong: $got")
  }

  test("stepTimes returns the matched timestamps of the greedy (= min-after-previous) chain") {
    val steps = Seq("signup", "view", "purchase")
    val events = Seq(
      (1L, "view", ts("2024-01-01 00:30:00")),     // before signup: ignored
      (1L, "signup", ts("2024-01-01 01:00:00")),
      (1L, "view", ts("2024-01-01 02:00:00")),     // first qualifying view
      (1L, "view", ts("2024-01-01 03:00:00")),     // later view: not matched
      (1L, "purchase", ts("2024-01-01 04:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val got = Funnel.stepTimes(events, "user_id", "event_type", "ts", steps)
      .select("step_ts").as[Seq[Timestamp]].head()
    assert(got == Seq(ts("2024-01-01 01:00:00"), ts("2024-01-01 02:00:00"),
      ts("2024-01-01 04:00:00")), s"matched chain wrong: $got")
  }

  test("chained (skew-safe) funnel equals the fold on the real stream, user for user") {
    val events = Tables(spark, sfDir).events
    val steps = Seq("signup", "view", "click", "purchase")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.select("__u", "step_ts").as[(Long, Seq[Timestamp])].collect().toMap
    val fold  = toMap(Funnel.stepTimes(events, "user_id", "event_type", "ts", steps))
    val chain = toMap(Funnel.stepTimesChained(events, "user_id", "event_type", "ts", steps))
    // chained omits users with no step-1 event; fold gives them []
    val foldReached = fold.filter(_._2.nonEmpty)
    assert(foldReached == chain.filter(_._2.nonEmpty), "fold and chain matched different timestamps")
    assert(chain.forall { case (u, t) => t.nonEmpty || fold(u).isEmpty })
  }

  test("funnel counts are non-increasing and bounded by distinct step-1 users on the real stream") {
    val events = Tables(spark, sfDir).events
    val steps = Seq("signup", "view", "click", "purchase")
    val got = Funnel.stepCounts(events, "user_id", "event_type", "ts", steps)
      .orderBy("step").as[(Int, String, Long)].collect().toList
    assert(got.size == 4, s"all four steps should be reachable at sf0.001: $got")
    assert(got.map(_._3) == got.map(_._3).sorted.reverse, s"counts must be non-increasing: $got")
    val signupUsers = events.filter($"event_type" === "signup")
      .select("user_id").distinct().count()
    assert(got.head._3 <= signupUsers, "step-1 count exceeds distinct signup users")
  }

  test("transition matrix counts successor pairs per user, never across users") {
    val events = Seq(
      (1L, 1L, "a", ts("2024-01-01 00:00:00"), 0.0),
      (2L, 1L, "b", ts("2024-01-01 01:00:00"), 0.0),
      (3L, 1L, "b", ts("2024-01-01 02:00:00"), 0.0),
      (4L, 2L, "a", ts("2024-01-01 00:00:00"), 0.0), // user 2's lone event: no edge
      (5L, 3L, "b", ts("2024-01-01 00:00:00"), 0.0),
      (6L, 3L, "a", ts("2024-01-01 01:00:00"), 0.0)
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    val got = Funnel.transitionMatrix(events, "user_id", "event_type", "ts", "event_id")
      .orderBy("from_type", "to_type")
      .as[(String, String, Long)].collect().toList
    assert(got == List(("a", "b", 1L), ("b", "a", 1L), ("b", "b", 1L)),
      s"expected a→b, b→a, b→b once each (user 2 contributes nothing): $got")
    // total edges == total events − one per user with ≥1 event
    val edges = Funnel.transitionMatrix(
      Tables(spark, sfDir).events, "user_id", "event_type", "ts", "event_id")
      .agg(sum("n_transitions")).as[Long].head()
    val ev    = Tables(spark, sfDir).events
    assert(edges == ev.count() - ev.select("user_id").distinct().count(),
      "edge mass must be n_events - n_users on the real stream")
  }

  test("last-touch attribution credits the preceding non-conversion touch, 'direct' when none") {
    val events = Seq(
      // user 1: view → purchase(10.00) → purchase(5.50): both credit 'view'
      (1L, 1L, "view", ts("2024-01-01 00:00:00"), 0.0),
      (2L, 1L, "purchase", ts("2024-01-01 01:00:00"), 10.0),
      (3L, 1L, "purchase", ts("2024-01-01 02:00:00"), 5.5),
      // user 2: purchase with no prior event → 'direct'
      (4L, 2L, "purchase", ts("2024-01-01 00:00:00"), 3.0),
      // user 3: click then view then purchase → the LAST touch (view) wins
      (5L, 3L, "click", ts("2024-01-01 00:00:00"), 0.0),
      (6L, 3L, "view", ts("2024-01-01 01:00:00"), 0.0),
      (7L, 3L, "purchase", ts("2024-01-01 02:00:00"), 2.25)
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    val got = Funnel.lastTouchAttribution(
        events, "user_id", "event_type", "ts", "event_id", "value", convType = "purchase")
      .orderBy("channel").as[(String, Long, Long)].collect().toList
    assert(got == List(("direct", 1L, 300L), ("view", 3L, 1775L)),
      s"expected direct=1/3.00 and view=3/17.75 in exact cents: $got")
  }
}
