package graft

import graft.operators.{JoinPrune, Skew}
import org.apache.spark.sql.functions._

/** Sketch-driven auto-salting and bloom join pruning: both move WORK
  * around the plan without ever moving the answer — specs pin the
  * exactness AND the work movement.
  */
class SkewJoinPruneSpec extends SparkSpec {
  import spark.implicits._

  // 1 hot key with ~90% of rows, 20 cold keys sharing the rest
  private lazy val skewed = {
    val hot  = (1 to 9000).map(i => ("hot", (i % 100).toDouble))
    val cold = (1 to 1000).map(i => (s"cold${i % 20}", (i % 50).toDouble))
    (hot ++ cold).toDF("k", "v").repartition(8)
  }

  test("sketchHotKeys flags exactly the keys above the share threshold") {
    val hot = Skew.sketchHotKeys(skewed, "k", threshold = 0.05)
    assert(hot == Seq("hot"), s"only the planted hot key crosses 5%: $hot")
    val none = Skew.sketchHotKeys(skewed, "k", threshold = 0.95)
    assert(none.isEmpty, "no key holds 95% of rows")
    // guard: a threshold the tracked capacity cannot certify is refused
    val e = intercept[IllegalArgumentException] {
      Skew.sketchHotKeys(skewed, "k", threshold = 0.0001, maxTracked = 64)
    }
    assert(e.getMessage.contains("maxTracked"))
  }

  test("autoSaltedSumCount is exact and fans out ONLY the hot key") {
    val got = Skew.autoSaltedSumCount(skewed, "k", col("v").cast("decimal(12,2)"),
        threshold = 0.05, saltBuckets = 16)
      .select(col("k"), col("total").cast("double"), col("n"))
      .as[(String, Double, Long)].collect().toSet
    val plain = skewed.groupBy("k")
      .agg(sum(col("v").cast("decimal(12,2)")).cast("double").as("total"), count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect().toSet
    assert(got == plain, "salting must not change the aggregate")

    // work movement: phase-1 partial groups = cold keys once + hot key fanned
    val hot = Skew.sketchHotKeys(skewed, "k", 0.05)
    val salt = when(col("k").isInCollection(hot),
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(16))).otherwise(lit(0))
    val phase1 = skewed.withColumn("__salt", salt)
      .groupBy("k", "__salt").count()
      .groupBy("k").agg(countDistinct("__salt").as("groups"))
      .as[(String, Long)].collect().toMap
    assert(phase1("hot") > 1, s"hot key must fan out: ${phase1("hot")} partial group(s)")
    assert(phase1.filter(_._1 != "hot").values.forall(_ == 1L),
      s"cold keys must keep ONE partial group: $phase1")
  }

  test("bloomPrunedJoin equals the plain join and prunes the fact side before the exchange") {
    val dim = Tables(spark, sfDir).customer
      .filter($"c_mktsegment" === "BUILDING").select("c_custkey", "c_mktsegment")
    val orders = Tables(spark, sfDir).orders
    val pruned = JoinPrune.bloomPrunedJoin(orders, dim, "o_custkey", "c_custkey",
        expectedKeys = 10000L, fpp = 0.01)
      .select("o_orderkey", "o_custkey").as[(Long, Long)].collect().toSet
    val plain = orders.join(dim, $"o_custkey" === $"c_custkey")
      .select("o_orderkey", "o_custkey").as[(Long, Long)].collect().toSet
    assert(pruned == plain, "bloom false positives must die in the join; no row may be lost")

    // the bloom predicate must sit scan-side: fewer fact rows survive it
    // than the table holds (the filter does real pruning pre-shuffle)
    val surviving = orders.filter(graft.plans.BloomExpressions.mightContainLong(
      $"o_custkey", dim.stat.bloomFilter("c_custkey", 10000L, 0.01))).count()
    val total    = orders.count()
    val matching = plain.size
    assert(surviving < total, s"bloom pruned nothing: $surviving of $total")
    assert(surviving >= matching, "one-sided error: every matching row must survive")
    // and the plan applies it inside the scan stage (Filter below Exchange)
    val plan = physicalPlan(JoinPrune.bloomPrunedJoin(orders, dim, "o_custkey", "c_custkey", 10000L))
    val s = plan.toString.toLowerCase
    assert(s.indexOf("bloommightcontainlong") >= 0 &&
      s.indexOf("bloommightcontainlong") < s.indexOf("filescan parquet"),
      s"bloom predicate must filter in the fact scan stage:\n$s")
  }
}
