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
}
