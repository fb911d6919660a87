package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

/** Frequent-items (heavy hitters) sketch family: exactness in the
  * no-eviction regime, the frequent-items guarantee under eviction, and
  * the persist-partials/rollup pattern.
  */
class SketchTopKSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = {
    // skewed stream: value v appears ~(11-v)*100 times across 10 shards
    val rows = for {
      v     <- 1 to 10
      shard <- 0 until 10
      _     <- 1 to (11 - v) * 10
    } yield (s"item$v", shard)
    rows.toDF("item", "shard")
  }

  test("approx_top_k with maxItemsTracked >= ndv is EXACT and complete") {
    val out = Sketches.approxTopK(events.withColumn("g", lit(1)), Seq("g"), "item",
        k = 10, maxItemsTracked = 64)
      .select(explode(col("top_items")).as("t")).select("t.*")
    val got = out.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val exact = events.groupBy("item").count().as[(String, Long)].collect().toMap
    assert(got == exact)
  }

  test("under eviction the heavy-hitter guarantee holds: top items survive with bounded error") {
    val n = events.count()
    val tracked = 8 // < ndv of 10: the two lightest items may evict
    val out = Sketches.approxTopK(events.withColumn("g", lit(1)), Seq("g"), "item",
        k = tracked, maxItemsTracked = tracked)
      .select(explode(col("top_items")).as("t")).select("t.*")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val exact = events.groupBy("item").count().as[(String, Long)].collect().toMap
    // any item with true count > n/tracked must be reported, with
    // estimate within n/tracked of truth
    for ((item, cnt) <- exact if cnt > n / tracked) {
      assert(out.contains(item), s"heavy hitter $item (count $cnt) missing")
      assert(math.abs(out(item) - cnt) <= n / tracked,
        s"$item estimate ${out(item)} vs true $cnt exceeds n/maxItemsTracked")
    }
  }

  test("partial sketches per shard roll up to the direct answer (exact regime)") {
    val direct = Sketches.approxTopK(events.withColumn("g", lit(1)), Seq("g"), "item",
        k = 10, maxItemsTracked = 64)
      .select(explode(col("top_items")).as("t")).select("t.*")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val partials = Sketches.partialTopK(events.withColumn("g", lit(1)), Seq("g"), Seq("shard"),
      "item", maxItemsTracked = 64)
    val rolled = Sketches.mergeTopK(partials, Seq("g"), k = 10, maxItemsTracked = 64)
      .select(explode(col("top_items")).as("t")).select("t.*")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rolled == direct)
  }

  test("joinKeyOverlap estimates each side within 5% and the intersection within the compounded bound") {
    val orders = Tables(spark, sfDir).orders
    val cust   = Tables(spark, sfDir).customer
    val row = Sketches.joinKeyOverlap(orders, "o_custkey", cust, "c_custkey").head()
    val (ndvA, ndvB, ndvU, ndvI) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    val exactA = orders.select("o_custkey").distinct().count()
    val exactB = cust.select("c_custkey").distinct().count()
    val exactI = orders.select(col("o_custkey").as("k")).distinct()
      .join(cust.select(col("c_custkey").as("k")).distinct(), "k").count()
    val exactU = exactA + exactB - exactI
    def within(est: Long, exact: Long, tol: Double) =
      math.abs(est - exact) <= math.max(1, tol * exact)
    assert(within(ndvA, exactA, 0.05), s"ndv_a $ndvA vs $exactA")
    assert(within(ndvB, exactB, 0.05), s"ndv_b $ndvB vs $exactB")
    assert(within(ndvU, exactU, 0.05), s"ndv_union $ndvU vs $exactU")
    // intersection inherits up to 3 single-sketch errors via a+b-union
    assert(math.abs(ndvI - exactI) <= math.max(3, 0.15 * exactI),
      s"ndv_intersect $ndvI vs $exactI exceeds the compounded bound")
    // no join in the plan: two aggregations + a 1-row scalar cross
    val plan = physicalPlan(Sketches.joinKeyOverlap(orders, "o_custkey", cust, "c_custkey"))
    assert(plan.collect {
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec  => j
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec     => j
    }.isEmpty, "the overlap estimate must not shuffle-join the tables")
  }
}
