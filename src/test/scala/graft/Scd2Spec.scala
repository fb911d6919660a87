package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.operators.Scd2

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("scd2 collapses no-op re-emits, tiles the timeline half-open, flags one current row per key") {
    // key 1: A → A (no-op) → B → B (no-op) → A; key 2: single version
    val changes = Seq(
      (1L, "A", ts("2024-01-01 00:00:00"), 1L),
      (1L, "A", ts("2024-01-02 00:00:00"), 2L),
      (1L, "B", ts("2024-01-03 00:00:00"), 3L),
      (1L, "B", ts("2024-01-04 00:00:00"), 4L),
      (1L, "A", ts("2024-01-05 00:00:00"), 5L),
      (2L, "X", ts("2024-01-01 12:00:00"), 6L)
    ).toDF("id", "status", "ts", "seq")

    val hist = Scd2.buildHistory(changes, Seq("id"), Seq("status"), "ts", Seq("seq"))
      .orderBy("id", "valid_from")
      .as[(Long, String, Timestamp, Option[Timestamp], Boolean)].collect().toList

    assert(hist == List(
      (1L, "A", ts("2024-01-01 00:00:00"), Some(ts("2024-01-03 00:00:00")), false),
      (1L, "B", ts("2024-01-03 00:00:00"), Some(ts("2024-01-05 00:00:00")), false),
      (1L, "A", ts("2024-01-05 00:00:00"), None, true),
      (2L, "X", ts("2024-01-01 12:00:00"), None, true)
    ), s"wrong history: $hist")
  }

  test("scd2 breaks equal-timestamp ties by orderCols and tracks multi-attribute structs") {
    // both changes share ts — seq must decide the order; two tracked
    // attrs where only one moves still opens a version
    val changes = Seq(
      (1L, "A", 10, ts("2024-01-01 00:00:00"), 2L),
      (1L, "B", 10, ts("2024-01-01 00:00:00"), 1L),
      (1L, "B", 20, ts("2024-01-02 00:00:00"), 3L)
    ).toDF("id", "status", "tier", "ts", "seq")

    val hist = Scd2.buildHistory(changes, Seq("id"), Seq("status", "tier"), "ts", Seq("seq"))
      .orderBy("valid_from", "status")
      .select("status", "tier", "valid_to", "is_current")
      .as[(String, Int, Option[Timestamp], Boolean)].collect().toList
    // seq order: B@10 then A@10 (same ts) then B@20 — all distinct
    // versions; equal-ts chaining must follow seq (B@10 closes at the
    // SAME instant A@10 opens, A@10 closes at day 2)
    assert(hist == List(
      ("A", 10, Some(ts("2024-01-02 00:00:00")), false),
      ("B", 10, Some(ts("2024-01-01 00:00:00")), false),
      ("B", 20, None, true)
    ), s"tie-break or multi-attr tracking wrong: $hist")
  }

  test("scd2 incremental: folding an append-only delta equals the from-scratch rebuild") {
    val events = Tables(spark, sfDir).events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
    val cutoff = "2024-01-20"
    val before = events.filter(col("ts") < lit(cutoff).cast("timestamp"))
    val delta  = events.filter(col("ts") >= lit(cutoff).cast("timestamp"))
    assert(delta.count() > 0 && before.count() > 0, "split must be non-trivial")

    val incremental = Scd2.applyChanges(
      Scd2.buildHistory(before, Seq("user_id"), Seq("event_type"), "ts", Seq("event_id"),
        keepOrder = true),
      delta, Seq("user_id"), Seq("event_type"), "ts", Seq("event_id"))
    val full = Scd2.buildHistory(events, Seq("user_id"), Seq("event_type"), "ts", Seq("event_id"),
      keepOrder = true)

    val inc = incremental.collect().map(_.toSeq).toSet
    val ful = full.collect().map(_.toSeq).toSet
    assert(inc == ful, s"incremental fold diverged from rebuild: ${(inc diff ful).take(3)} vs ${(ful diff inc).take(3)}")
  }

  test("scd2 point-in-time lookup attaches the version valid at each fact timestamp") {
    val changes = Seq(
      (1L, "A", ts("2024-01-01 00:00:00"), 1L),
      (1L, "B", ts("2024-01-03 00:00:00"), 2L),
      (2L, "X", ts("2024-01-02 00:00:00"), 3L)
    ).toDF("id", "status", "ts", "seq")
    val hist = Scd2.buildHistory(changes, Seq("id"), Seq("status"), "ts", Seq("seq"))
    val facts = Seq(
      (100L, 1L, ts("2024-01-02 00:00:00")), // inside [A, B)
      (101L, 1L, ts("2024-01-03 00:00:00")), // exactly at B's open: B (half-open)
      (102L, 1L, ts("2024-06-01 00:00:00")), // current version
      (103L, 2L, ts("2024-01-01 00:00:00")), // before 2's first version: null
      (104L, 2L, ts("2024-01-02 00:00:00"))  // exactly at first open: X
    ).toDF("fact_id", "id", "fts")
    val got = Scd2.lookupAsOf(facts, hist, Seq("id"), "fts", Seq("status"))
      .select("fact_id", "last_status").as[(Long, Option[String])]
      .collect().toMap
    assert(got == Map(100L -> Some("A"), 101L -> Some("B"), 102L -> Some("B"),
      103L -> None, 104L -> Some("X")), s"point-in-time lookup wrong: $got")
  }

  test("scd2 plans ONE exchange: collapse + interval windows share the key partitioning") {
    val changes = Tables(spark, sfDir).events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
    val hist = Scd2.buildHistory(changes, Seq("user_id"), Seq("event_type"), "ts", Seq("event_id"))
    hist.count() // materialize through AQE so the final plan is real
    val exchanges = physicalPlan(hist).collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.size == 1,
      s"SCD2 build should shuffle once on the key, found ${exchanges.size} exchanges")
  }
}
