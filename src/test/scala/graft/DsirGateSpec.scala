package graft

import graft.operators.Curation
import graft.streaming.DsirGate
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming DSIR admission gate: fixed offline models, per-micro-batch
  * scoring, threshold routing, batch-boundary independence.
  */
class DsirGateSpec extends SparkSpec {
  import spark.implicits._

  private val targetText = "alpha beta gamma delta alpha beta gamma delta"
  private val poolText   = "omega psi chi phi omega psi chi phi"

  private def models = {
    val pool = ((0L until 10L).map(i => (i, targetText)) ++
      (10L until 100L).map(i => (i, poolText))).toDF("doc_id", "text")
    (Curation.dsirModel(pool, "text"),
     Curation.dsirModel(pool.filter(col("doc_id") < 10), "text"))
  }

  test("gate admits target-dialect docs, rejects pool-dialect and bigram-less docs") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val (poolModel, targetModel) = models
    // threshold between the two dialects' scores, measured from the
    // batch operator on the same models
    val scores = Curation.dsirScoreAgainst(poolModel, targetModel,
        Seq((1L, targetText), (2L, poolText)).toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id").select("dsir_score").as[Double].collect()
    val cut = (scores(0) + scores(1)) / 2

    val base = Files.createTempDirectory("graft_dsir_gate").toString
    val input = MemoryStream[(Long, String)]
    val summaries = scala.collection.mutable.ArrayBuffer.empty[DsirGate.BatchSummary]
    val q = DsirGate.start(input.toDF().toDF("doc_id", "text"),
      poolModel, targetModel, "doc_id", "text", cut,
      s"$base/target", s"$base/reject", s"$base/ckpt",
      onBatch = s => summaries.synchronized { summaries += s })
    try {
      input.addData((100L, targetText), (101L, poolText), (102L, "single"))
      q.processAllAvailable()
    } finally q.stop()

    val admitted = spark.read.parquet(s"$base/target")
      .select("doc_id").as[Long].collect().toSet
    val rejected = spark.read.parquet(s"$base/reject")
      .select("doc_id").as[Long].collect().toSet
    assert(admitted == Set(100L), s"admitted $admitted")
    assert(rejected == Set(101L, 102L), s"rejected $rejected") // no-bigram doc rejected
    val s = summaries.synchronized(summaries.toList).find(_.total == 3).get
    assert(s.admitted == 1)
  }

  test("scores are batch-boundary independent (fixed models, no delta merge)") {
    val (poolModel, targetModel) = models
    def score(docs: Seq[(Long, String)]): Map[Long, Double] =
      Curation.dsirScoreAgainst(poolModel, targetModel,
          docs.toDF("doc_id", "text"), "doc_id", "text")
        .select("doc_id", "dsir_score").as[(Long, Double)].collect().toMap
    val together = score(Seq((1L, targetText), (2L, poolText)))
    val separate = score(Seq((1L, targetText))) ++ score(Seq((2L, poolText)))
    assert(together == separate,
      "a doc's gate score must not depend on which batch it arrived in")
  }
}
