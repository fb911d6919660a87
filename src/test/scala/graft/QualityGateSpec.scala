package graft

import graft.operators.DataQuality
import graft.streaming.QualityGate
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** In-stream validation gate: routing, quarantine annotation, metrics. */
class QualityGateSpec extends SparkSpec {
  import spark.implicits._

  private val checks = Seq(
    DataQuality.inRange("qty", 0, 100),
    DataQuality.matches("flag", "^[ANR]$"))

  test("streaming gate routes rows per micro-batch and reports per-check counts") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = Files.createTempDirectory("graft_qgate").toString
    val input = MemoryStream[(Long, Double, String)]
    val summaries = scala.collection.mutable.ArrayBuffer.empty[QualityGate.BatchSummary]

    val q = QualityGate.start(
      input.toDF().toDF("id", "qty", "flag"), checks,
      s"$base/target", s"$base/quarantine", s"$base/ckpt",
      onBatch = s => summaries.synchronized { summaries += s })
    try {
      input.addData((1L, 10.0, "A"), (2L, -5.0, "A"), (3L, 10.0, "X"), (4L, 200.0, "X"))
      q.processAllAvailable()
    } finally q.stop()

    // epoch= is a hive-style provenance partition column on read
    val good = spark.read.parquet(s"$base/target")
      .select("id", "qty", "flag").as[(Long, Double, String)].collect().toSet
    val bad  = spark.read.parquet(s"$base/quarantine")
      .select("id", "__failed_checks").as[(Long, String)].collect().toMap
    assert(good == Set((1L, 10.0, "A")))
    assert(bad == Map(2L -> "range_qty", 3L -> "matches_flag", 4L -> "range_qty,matches_flag"))

    val s = summaries.synchronized(summaries.toList).find(_.total == 4).get
    assert(s.quarantined == 3)
    assert(s.perCheck == Map("range_qty" -> 2L, "matches_flag" -> 2L))
  }

  test("batch replay with the same epoch id is idempotent (overwrite, not double-append)") {
    val base  = Files.createTempDirectory("graft_qgate_replay").toString
    val batch = Seq((1L, 10.0, "A"), (2L, -5.0, "A")).toDF("id", "qty", "flag")
    QualityGate.routeBatch(batch, checks, s"$base/t", s"$base/q", batchId = 7L)
    QualityGate.routeBatch(batch, checks, s"$base/t", s"$base/q", batchId = 7L)
    assert(spark.read.parquet(s"$base/t").count() == 1)
    assert(spark.read.parquet(s"$base/q").count() == 1)
  }
}
