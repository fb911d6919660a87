package graft

import graft.operators.{Dedup, Drift, SnapshotDiff}
import org.apache.spark.sql.functions._

/** Round-5 change-detection operators: snapshot diff, corpus drift,
  * incremental dedup against a stored band index.
  */
class DriftDiffSpec extends SparkSpec {
  import spark.implicits._

  test("snapshot diff classifies planted adds/deletes/changes and drops unchanged") {
    val old = Seq((1L, 10.0, "A"), (2L, 20.0, "B"), (3L, 30.0, "C"), (5L, 50.0, "E"))
      .toDF("k", "price", "status")
    val neu = Seq((1L, 10.0, "A"), (2L, 25.0, "B"), (4L, 40.0, "D"), (5L, 50.0, "X"))
      .toDF("k", "price", "status")
    val out = SnapshotDiff.diff(old, neu, Seq("k"), Seq("price", "status"))
      .select("k", "change_type").as[(Long, String)].collect().toMap
    assert(out == Map(2L -> "changed", 3L -> "deleted", 4L -> "added", 5L -> "changed"))
  }

  test("snapshot diff is null-safe: null payloads compare, presence comes from the join") {
    val old = Seq((1L, Option.empty[Double]), (2L, Some(2.0)), (3L, Option.empty[Double]))
      .toDF("k", "v")
    val neu = Seq((1L, Option.empty[Double]), (2L, Option.empty[Double]), (4L, Option.empty[Double]))
      .toDF("k", "v")
    val out = SnapshotDiff.diff(old, neu, Seq("k"), Seq("v"))
      .select("k", "change_type").as[(Long, String)].collect().toMap
    // k=1: null == null → unchanged (dropped); k=2: value→null → changed;
    // k=3: all-null payload still registers as deleted; k=4: as added
    assert(out == Map(2L -> "changed", 3L -> "deleted", 4L -> "added"))
  }

  test("token drift matches hand-computed shares") {
    val a = Seq("a a b").toDF("text")
    val b = Seq("a b b").toDF("text")
    val out = Drift.tokenDrift(a, b, "text", k = 10)
      .as[(String, Long, Long, Double)].collect().sortBy(_._1)
    val third = 2.0 / 3 - 1.0 / 3
    assert(out.toSeq == Seq(("a", 2L, 1L, third), ("b", 1L, 2L, third)))
  }

  test("token drift flags a token present in only one slice, ties break on token") {
    // shares chosen exactly representable (halves) so the x/y drift tie
    // is exact and the (drift desc, token) tie-break is what decides
    val a = Seq("x y").toDF("text")
    val b = Seq("y").toDF("text")
    val out = Drift.tokenDrift(a, b, "text", k = 1)
      .as[(String, Long, Long, Double)].collect()
    assert(out.head == (("x", 1L, 0L, 0.5)), s"got ${out.head}")
  }

  test("drift against an empty slice reports full shares, not nulls") {
    val a   = Seq("x y").toDF("text")
    val b   = a.filter(lit(false))
    val out = Drift.tokenDrift(a, b, "text", k = 10)
      .as[(String, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(("x", 1L, 0L, 0.5), ("y", 1L, 0L, 0.5)))
  }

  test("dq gate on an empty batch reports zero violations, not nulls") {
    val empty = Seq((1L, 1.0)).toDF("id", "v").filter(lit(false))
    val out = graft.operators.DataQuality.rowChecks(empty,
        Seq(graft.operators.DataQuality.notNull("id")))
      .as[(String, Long, Long)].collect()
    assert(out.toSeq == Seq(("not_null_id", 0L, 0L)))
  }

  test("snapshot diff of identical snapshots is empty; against an empty side it is total") {
    val s = Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
    assert(SnapshotDiff.diff(s, s, Seq("k"), Seq("v")).count() == 0)
    val empty = s.filter(lit(false))
    val allAdded = SnapshotDiff.diff(empty, s, Seq("k"), Seq("v"))
      .select("change_type").distinct().as[String].collect().toSeq
    assert(allAdded == Seq("added"))
  }

  test("applyChanges(old, diff(old, new)) == new for an arbitrary snapshot pair") {
    val o = Tables(spark, sfDir).orders.select("o_orderkey", "o_totalprice", "o_orderstatus")
    val oldSnap = o.filter(pmod($"o_orderkey", lit(3)) =!= 0)
    val newSnap = o.filter(pmod($"o_orderkey", lit(4)) =!= 1)
      .withColumn("o_totalprice",
        $"o_totalprice" + when(pmod($"o_orderkey", lit(5)) === 0, 7.0).otherwise(0.0))
    val keys = Seq("o_orderkey"); val cols = Seq("o_totalprice", "o_orderstatus")
    val rebuilt = SnapshotDiff.applyChanges(
      oldSnap, SnapshotDiff.diff(oldSnap, newSnap, keys, cols), keys, cols)
    assert(rebuilt.orderBy("o_orderkey").collect().toSeq ==
      newSnap.orderBy("o_orderkey").collect().toSeq)
    // and an empty change stream is a no-op
    val noop = SnapshotDiff.applyChanges(
      oldSnap, SnapshotDiff.diff(oldSnap, oldSnap, keys, cols), keys, cols)
    assert(noop.orderBy("o_orderkey").collect().toSeq ==
      oldSnap.orderBy("o_orderkey").collect().toSeq)
  }

  test("incremental dedup finds planted delta near-dups of history without scanning history text") {
    val history = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "completely different content about spark catalyst optimizer internals"),
      (4L, "yet another unrelated document describing parquet column encodings")
    ).toDF("doc_id", "text")
    // delta 1 = near-copy of history 0; delta 3 = unrelated
    val delta = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again tonight"),
      (3L, "totally novel text with no overlap whatsoever in shingle space")
    ).toDF("doc_id", "text")

    val out = Dedup.minhashIncremental(
        history, Dedup.bandIndex(history, "doc_id", "text"), delta,
        "doc_id", "text", threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    assert(out.map(r => (r._1, r._2)).toSet == Set((1L, 0L)),
      s"expected exactly the planted near-dup, got ${out.toSeq}")
    assert(out.head._3 >= 0.5)
  }

  test("incremental dedup output against the real corpus equals the cross-parity subset of full minhash dedup") {
    val docs    = Tables(spark, sfDir).documents
    val history = docs.filter(pmod($"doc_id", lit(2)) === 0)
    val delta   = docs.filter(pmod($"doc_id", lit(2)) === 1)
    val inc = Dedup.minhashIncremental(
        history, Dedup.bandIndex(history, "doc_id", "text"), delta, "doc_id", "text")
      .select("delta_id", "hist_id").as[(Long, Long)].collect().toSet
    val full = Dedup.minhashNearDups(docs, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val crossParity = full.collect {
      case (a, b) if a % 2 == 0 && b % 2 == 1 => (b, a)
      case (a, b) if a % 2 == 1 && b % 2 == 0 => (a, b)
    }
    assert(inc == crossParity, s"incremental=${inc.size} vs full-cross-parity=${crossParity.size}")
  }
}
