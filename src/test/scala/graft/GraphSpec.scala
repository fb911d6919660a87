package graft

import graft.operators.{Funnel, Graph}

/** PageRank over derived bounded graphs: rank ordering on known
  * topologies, exact-integer determinism, and the boundedness guard.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("star graph: the hub out-ranks every spoke; ranks are deterministic across runs") {
    // 4 spokes all point at the hub; hub points back at one spoke
    val edges = Seq(
      ("s1", "hub", 10L), ("s2", "hub", 10L), ("s3", "hub", 10L), ("s4", "hub", 10L),
      ("hub", "s1", 1L)
    ).toDF("src", "dst", "w")
    val pr = Graph.pageRank(edges, "src", "dst", "w").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // s1 receives ALL of the hub's (large) mass, so s1 > hub > unfed spokes
    assert(pr("s1") > pr("hub") && pr("hub") > pr("s2"),
      s"expected s1 (fed by the hub) > hub (fed by 4 spokes) > unfed spokes: $pr")
    assert(pr("s2") == pr("s3") && pr("s3") == pr("s4"), "symmetric spokes must tie exactly")
    val again = Graph.pageRank(edges, "src", "dst", "w").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pr == again, "integer fixed-point must be bit-identical across runs")
  }

  test("weights matter: a heavier edge pulls more rank than a lighter one from the same source") {
    val edges = Seq(("a", "b", 9L), ("a", "c", 1L), ("b", "a", 1L), ("c", "a", 1L))
      .toDF("src", "dst", "w")
    val pr = Graph.pageRank(edges, "src", "dst", "w").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pr("b") > pr("c"), s"b receives 9/10 of a's mass vs c's 1/10: $pr")
  }

  test("event-type transition ranks on the real stream are positive and sum below the scale (dangling leak only)") {
    val edges = Funnel.transitionMatrix(Tables(spark, sfDir).events,
      "user_id", "event_type", "ts", "event_id")
    val pr = Graph.pageRank(edges, "from_type", "to_type", "n_transitions").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pr.nonEmpty && pr.values.forall(_ > 0))
    // total mass stays <= S: truncating divides + dangling nodes only LOSE mass
    assert(pr.values.sum <= 1000000000L, s"mass ${pr.values.sum} exceeds the fixed-point scale")
  }

  test("the boundedness guard refuses an oversized edge table") {
    val big = spark.range(0, 200).selectExpr("CAST(id AS STRING) AS src",
      "CAST(id + 1 AS STRING) AS dst", "1L AS w")
    val e = intercept[IllegalArgumentException] {
      Graph.pageRank(big, "src", "dst", "w", maxEdges = 100)
    }
    assert(e.getMessage.contains("derivation-bounded"))
  }
}
