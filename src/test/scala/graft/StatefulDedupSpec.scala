package graft

import graft.streaming.StatefulDedup
import graft.streaming.StatefulDedup.Keyed
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class StatefulDedupSpec extends SparkSpec {
  import spark.implicits._

  test("flatMapGroupsWithState dedupes keys across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Keyed]
    val out = StatefulDedup.firstSeenOnly(spark, input.toDS())
    val q = out.writeStream.format("memory").queryName("sd_sink")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()

    input.addData(Keyed("a", "a1"), Keyed("b", "b1"), Keyed("a", "a2"))
    q.processAllAvailable()
    // batch 2: 'a' and 'b' already seen; only 'c' is new
    input.addData(Keyed("a", "a3"), Keyed("c", "c1"), Keyed("b", "b2"))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("sd_sink").as[Keyed].collect().map(k => k.key -> k.payload).toMap
    assert(rows.keySet == Set("a", "b", "c"))
    assert(rows("a") == "a1" && rows("c") == "c1", s"first-seen payloads expected: $rows")
  }

  test("dropDuplicatesWithinWatermark dedupes with bounded event-time state") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, String)]
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val df = graft.streaming.StatefulDedup.dedupWithinWatermark(
      input.toDF().toDF("ts", "k", "payload"), "ts", Seq("k"), delay = "10 minutes")
    val q = df.writeStream.format("memory").queryName("wm_dedup_sink")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()

    // batch 1: key a twice within the horizon -> one survivor
    input.addData((t(0), "a", "a1"), (t(1), "a", "a2"), (t(0), "b", "b1"))
    q.processAllAvailable()
    // batch 2: same key within the watermark window is still a duplicate
    input.addData((t(5), "a", "a3"))
    q.processAllAvailable()
    // batch 3: advance event time far past the watermark; 'a' state has
    // been evicted, so a new 'a' row is NOT deduped against history
    input.addData((t(50), "c", "c1"))
    q.processAllAvailable()
    input.addData((t(55), "a", "a4"))
    q.processAllAvailable()
    q.stop()

    val payloads = spark.table("wm_dedup_sink").collect().map(_.getString(2)).toSet
    assert(payloads.intersect(Set("a1", "a2")).size == 1, s"one survivor in batch 1: $payloads")
    assert(!payloads.contains("a3"), s"within-watermark duplicate must drop: $payloads")
    assert(payloads.contains("a4"), s"post-eviction key must pass again (bounded state): $payloads")
    assert(payloads.contains("b1") && payloads.contains("c1"))
  }

  test("stream-stream interval join matches only rows inside the event-time bound") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.functions.expr
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val views  = MemoryStream[(java.sql.Timestamp, String, String)]
    val clicks = MemoryStream[(java.sql.Timestamp, String, String)]
    val joined = graft.streaming.StreamPipeline.intervalJoin(
      views.toDF().toDF("v_ts", "v_user", "view_id"),
      clicks.toDF().toDF("c_ts", "c_user", "click_id"),
      leftTsCol = "v_ts", rightTsCol = "c_ts", delay = "10 minutes",
      condition = expr("v_user = c_user AND c_ts BETWEEN v_ts AND v_ts + INTERVAL 5 MINUTES"))
    val q = joined.writeStream.format("memory").queryName("ssj_sink")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()

    views.addData((t(0), "u1", "v1"), (t(0), "u2", "v2"))
    clicks.addData((t(3), "u1", "c1"))   // in window for v1
    q.processAllAvailable()
    clicks.addData((t(9), "u2", "c2"))   // OUT of window for v2 (9 > 5 min)
    clicks.addData((t(4), "u3", "c3"))   // no matching view user
    q.processAllAvailable()
    q.stop()

    val pairs = spark.table("ssj_sink").collect()
      .map(r => (r.getAs[String]("view_id"), r.getAs[String]("click_id"))).toSet
    assert(pairs == Set(("v1", "c1")), s"only the in-window pair must join: $pairs")
  }
}
