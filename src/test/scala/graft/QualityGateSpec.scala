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

  test("validation checks load from the declarative stream spec and drive the gate") {
    val spec = graft.streaming.StreamSpec.parse(
      """validation:
        |  quarantinePath: /tmp/q
        |  checks:
        |    - field: qty
        |      rule: inRange
        |      min: 0
        |      max: 100
        |    - field: flag
        |      rule: matches
        |      pattern: "^[ANR]$"
        |    - field: id
        |      rule: notNull
        |""".stripMargin)
    val parsed = graft.streaming.StreamSpec.qualityChecks(spec)
    assert(parsed.map(_.name) == Seq("range_qty", "matches_flag", "not_null_id"))
    assert(graft.streaming.StreamSpec.quarantinePath(spec).contains("/tmp/q"))

    val base  = Files.createTempDirectory("graft_qgate_spec").toString
    val batch = Seq((1L, 10.0, "A"), (2L, 500.0, "Z")).toDF("id", "qty", "flag")
    val s = QualityGate.routeBatch(batch, parsed, s"$base/t", s"$base/q", batchId = 0L)
    assert(s.total == 2 && s.quarantined == 1)
    assert(s.perCheck == Map("range_qty" -> 1L, "matches_flag" -> 1L, "not_null_id" -> 0L))
  }

  test("an unknown validation rule is a spec error, not a silent skip") {
    val spec = graft.streaming.StreamSpec.parse(
      """validation:
        |  checks:
        |    - field: qty
        |      rule: frobnicate
        |""".stripMargin)
    intercept[IllegalArgumentException](graft.streaming.StreamSpec.qualityChecks(spec))
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
