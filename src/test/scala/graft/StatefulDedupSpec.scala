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
}
