package graft

import graft.operators.{Bucketing, Dedup, Similarity}
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed join on the bucket key plans without a shuffle") {
    val t = Tables(spark, sfDir)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Bucketing.writeBucketed(t.orders, "b_orders", "o_orderkey", buckets = 4)
    Bucketing.writeBucketed(
      t.lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", "o_orderkey", buckets = 4)
    val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    assert(joined.count() > 0)
  }

  test("resolveSurvivors keeps one doc per near-dup component") {
    val docs  = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    // components: {1,2,3} (chain), {4,5}; survivors = 1 and 4
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val out = Dedup.resolveSurvivors(docs, pairs, "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 4L))
  }

  test("resolveSurvivors converges on a chain far deeper than the iteration budget") {
    // a 200-hop path component: naive one-hop min-propagation needs 200
    // rounds and would exit the 64-round budget silently mislabeled;
    // pointer doubling must resolve it in ~log2(200) ≈ 8 rounds (and
    // since round 9 a non-converged exit throws instead of returning)
    val n     = 200
    val docs  = (0L until n.toLong).toDF("doc_id")
    val pairs = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Dedup.resolveSurvivors(docs, pairs, "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(0L), s"chain must collapse to its minimum id, got $out")
  }

  test("collapsed LSH near-dup: identical vectors fold to a representative with group sizes") {
    val base = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    val near = base.clone(); near(0) = near(0) + 0.02f // tiny perturbation: near-dup
    val far  = Array.tabulate(64)(i => math.cos(3 * i + 2).toFloat)
    val vecs = Seq(
      (10L, base), (11L, base), (12L, base), // 3 exact copies
      (20L, near),
      (30L, far)
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.lshNearDupPairsCollapsed(vecs, "vec_id", "embedding",
        threshold = 0.9, dim = 64)
      .select("id_a", "id_b", "n_a", "n_b").as[(Long, Long, Long, Long)].collect().toList
    // C(3,2)=3 intra-group pairs never materialize; the surviving
    // representative pair carries the group cardinality
    assert(pairs == List((10L, 20L, 3L, 1L)), s"got $pairs")
  }

  test("LSH embedding near-dup pairs find what the exact scan finds") {
    val e = Tables(spark, sfDir).embeddings
    val exact = Similarity.embeddingNearDups(e, "vec_id", "embedding", threshold = 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshNearDupPairs(e, "vec_id", "embedding", threshold = 0.4, dim = 64)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact), "LSH must not invent pairs (cosine filter is exact)")
    if (exact.nonEmpty) {
      val recall = lsh.intersect(exact).size.toDouble / exact.size
      assert(recall >= 0.5, s"recall $recall too low for tables=16 bits=4")
    }
  }
}
