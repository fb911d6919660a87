package graft

import graft.plans.CappedDistinct
import org.apache.spark.sql.functions._

/** The saturating distinct-threshold aggregate must be EXACTLY
  * countDistinct >= k — it feeds the span-hygiene hot set, which is
  * oracle-gated, so any divergence (a dropped id in merge, a wrong
  * saturation rule) corrupts corpus cleaning silently.
  */
class CappedDistinctSpec extends SparkSpec {
  import spark.implicits._

  private def check(rows: Seq[(String, Long)], k: Int): Unit = {
    val df = rows.toDF("g", "id").repartition(4) // force partial + merge paths
    val got = df.groupBy("g")
      .agg(CappedDistinct.distinctAtLeast(col("id"), k).as("hot"))
    val want = df.groupBy("g")
      .agg((countDistinct(col("id")) >= k).as("hot"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      s"distinct_at_least(k=$k) diverged from countDistinct >= $k")
  }

  test("matches countDistinct >= k across group shapes and k") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.tabulate(4000) { i =>
      (s"g${rnd.nextInt(40)}", rnd.nextInt(8).toLong) // heavy duplication
    } ++ Seq(("lonely", 1L), ("pair", 1L), ("pair", 2L))
    for (k <- Seq(1, 2, 3, 7, 9)) check(rows, k)
  }

  test("nulls are ignored, all-null group is not hot") {
    val df = Seq(("a", Some(1L)), ("a", None), ("b", None))
      .toDF("g", "id").repartition(3)
    val got = df.groupBy("g")
      .agg(CappedDistinct.distinctAtLeast(col("id"), 1).as("hot"))
      .orderBy("g").as[(String, Boolean)].collect().toSeq
    assert(got == Seq(("a", true), ("b", false)))
  }

  test("saturation survives serialize/deserialize round-trip at scale of a shuffle") {
    // 50 partitions of the same group: every merge path and serde path runs
    val df = spark.range(0, 5000).select(lit("g").as("g"), (col("id") % 2).as("id"))
      .repartition(50)
    val hot2 = df.groupBy("g").agg(CappedDistinct.distinctAtLeast(col("id"), 2).as("h"))
      .select("h").as[Boolean].head()
    val hot3 = df.groupBy("g").agg(CappedDistinct.distinctAtLeast(col("id"), 3).as("h"))
      .select("h").as[Boolean].head()
    assert(hot2 && !hot3)
  }
}
