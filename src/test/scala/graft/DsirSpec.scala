package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._

/** DSIR importance weighting: target-like documents must outscore
  * pool-typical ones, selection must be the deterministic top-k, and
  * the plan must keep both models broadcast (the pool never shuffles
  * into a join).
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // two sharply separated dialects: target speaks "alpha beta ...",
  // the pool bulk speaks "omega psi ..."
  private val targetText = "alpha beta gamma delta alpha beta gamma delta"
  private val poolText   = "omega psi chi phi omega psi chi phi"
  private val docs = (
    (0L until 10L).map(i => (i, targetText)) ++
    (10L until 100L).map(i => (i, poolText))
  ).toDF("doc_id", "text")
  private val target = docs.filter(col("doc_id") < 10)

  test("target-dialect documents outscore pool-dialect documents") {
    val w = Curation.dsirWeights(docs, target, "doc_id", "text")
    val byDialect = w.withColumn("is_target", col("doc_id") < 10)
      .groupBy("is_target").agg(min("dsir_score").as("lo"), max("dsir_score").as("hi"))
      .as[(Boolean, Double, Double)].collect().map { case (k, lo, hi) => k -> (lo, hi) }.toMap
    assert(byDialect(true)._1 > byDialect(false)._2,
      s"every target doc must outscore every pool doc: $byDialect")
  }

  test("dsirSelect returns exactly the k best with doc-id tiebreak") {
    val sel = Curation.dsirSelect(docs, target, "doc_id", "text", k = 12)
      .select("doc_id").as[Long].collect().toSeq
    // 10 target docs win outright; the remaining 2 slots go to the
    // smallest pool doc ids (all pool docs tie on score)
    assert(sel == ((0L until 10L) ++ Seq(10L, 11L)))
  }

  test("both models broadcast; the pool-side join never shuffles the corpus") {
    val plan = physicalPlan(Curation.dsirWeights(docs, target, "doc_id", "text"))
    val bcasts = plan.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }
    assert(bcasts.size == 2, s"expected 2 broadcast model joins, got ${bcasts.size}")
    assert(plan.collect {
      case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec       => s
      case s: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec    => s
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec    => c
      case n: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => n
    }.isEmpty, "a model join fell back to a corpus shuffle")
  }

  test("incremental scoring against persisted models equals batch restricted to the delta") {
    val history = docs.filter(col("doc_id") % 2 === 0)
    val delta   = docs.filter(col("doc_id") % 2 === 1)
    val inc = Curation.dsirWeightsIncremental(
      Curation.dsirModel(history, "text"), Curation.dsirModel(target, "text"),
      delta, "doc_id", "text")
    val batch = Curation.dsirWeights(docs, target, "doc_id", "text")
      .filter(col("doc_id") % 2 === 1)
    assert(inc.except(batch).isEmpty && batch.except(inc).isEmpty,
      "incremental DSIR diverged from batch restricted to delta ids")
  }

  test("fixed-point term math matches a direct reference computation") {
    // tiny corpus, hand-checkable: recompute the score in Scala doubles
    // from first principles and compare exactly (same integer terms)
    val mini = Seq((1L, "a b c"), (2L, "a b a b"), (3L, "c d c d")).toDF("doc_id", "text")
    val tgt  = mini.filter(col("doc_id") === 1)
    val got = Curation.dsirWeights(mini, tgt, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq

    def bucket(g: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(3)
    }
    val grams = Map(
      1L -> Seq("a b", "b c"), 2L -> Seq("a b", "b a", "a b"), 3L -> Seq("c d", "d c", "c d"))
    val tc = grams(1L).groupBy(bucket).map { case (b, g) => b -> g.size.toLong }
    val rc = grams.values.flatten.toSeq.groupBy(bucket).map { case (b, g) => b -> g.size.toLong }
    val want = grams.toSeq.sortBy(_._1).map { case (id, gs) =>
      val byB = gs.groupBy(bucket).map { case (b, g) => b -> g.size.toLong }
      val fp = byB.map { case (b, c) =>
        c * (tc.getOrElse(b, 0L) + 1L) * 1000000000L / (rc(b) + 1L)
      }.sum
      val n = gs.size.toLong
      (id, n, fp.toDouble / (n * 1000000000L).toDouble)
    }
    assert(got == want, s"got $got want $want")
  }
}
