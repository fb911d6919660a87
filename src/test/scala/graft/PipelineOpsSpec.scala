package graft

import graft.operators.{Curation, DataQuality, Incremental}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Round-5 pipeline operators: data-quality gate, incremental aggregate
  * maintenance, deterministic training shuffle, ORC interchange.
  */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("dq gate counts planted violations exactly") {
    val df = Seq(
      (1L, 10.0, "A", 100L),
      (2L, -5.0, "A", 100L),  // range violation
      (3L, 10.0, "X", 100L),  // regex violation
      (3L, 10.0, "A", 999L),  // dup id + orphan fk
      (4L, 10.0, "A", 100L)
    ).toDF("id", "qty", "flag", "fk")
    val dim = Seq(100L).toDF("pk")

    val out = DataQuality.gate(
      df,
      rowLevel = Seq(
        DataQuality.notNull("id"),
        DataQuality.inRange("qty", 0, 50),
        DataQuality.matches("flag", "^[ANR]$")),
      uniqueKeys = Seq("id"),
      refs = Seq(("fk", dim, "pk"))
    ).as[(String, Long, Long)].collect().map { case (k, v, _) => k -> v }.toMap

    assert(out("not_null_id") == 0)
    assert(out("range_qty") == 1)
    assert(out("matches_flag") == 1)
    assert(out("unique_id") == 1)   // one extra copy of id=3
    assert(out("ref_fk_to_pk") == 1)
  }

  test("dq row checks fold into a single aggregation (no per-check scans)") {
    val df = Tables(spark, sfDir).lineitem
    val plan = physicalPlan(DataQuality.rowChecks(df,
      Seq(DataQuality.notNull("l_orderkey"), DataQuality.inRange("l_quantity", 1, 50))))
    val scans = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s
    }
    assert(scans.length == 1, s"expected one scan for all row checks, got ${scans.length}")
  }

  test("full dq gate costs two fact scans (row+FK pass, uniqueness pass), no nested loops") {
    val t = Tables(spark, sfDir)
    val plan = physicalPlan(DataQuality.gate(
      t.lineitem,
      rowLevel = Seq(DataQuality.notNull("l_orderkey"), DataQuality.inRange("l_quantity", 1, 50)),
      uniqueKeys = Seq("l_orderkey", "l_linenumber"),
      refs = Seq(("l_partkey", t.part, "p_partkey"), ("l_suppkey", t.supplier, "s_suppkey"))))
    val s = plan.toString
    assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"),
      s"gate must not plan nested loops:\n$s")
    val factScans = plan.collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec
        if sc.relation.location.rootPaths.exists(_.toString.contains("lineitem")) => sc
    }
    assert(factScans.length == 2, s"expected exactly 2 fact scans, got ${factScans.length}:\n$s")
  }

  test("incremental refresh is bit-equal to full recompute under any split") {
    val li = Tables(spark, sfDir).lineitem
    val keys = Seq("l_returnflag"); val vals = Seq("l_quantity", "l_extendedprice")
    val full = Incremental.summarize(li, keys, vals)

    for (mod <- Seq(2, 7)) {
      val history = li.filter(pmod($"l_orderkey", lit(mod)) === 0)
      val delta   = li.filter(pmod($"l_orderkey", lit(mod)) =!= 0)
      val merged  = Incremental.refresh(Incremental.summarize(history, keys, vals), delta, keys, vals)
      assert(merged.orderBy("l_returnflag").collect().toSeq ==
        full.orderBy("l_returnflag").collect().toSeq, s"mod=$mod split drifted")
    }
  }

  test("incremental join view equals the full re-join; delta sides broadcast") {
    val o  = Tables(spark, sfDir).orders
    val li = Tables(spark, sfDir).lineitem
    val onKey = $"o_orderkey" === $"l_orderkey"
    val cols  = Seq("o_orderkey", "l_linenumber", "o_totalprice", "l_quantity")
    // (o_orderkey, l_linenumber) is NOT unique in the synthetic data —
    // canonicalize rows fully before comparing
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select(cols.map(col): _*).collect().map(_.mkString("|")).sorted.toSeq
    val full = canon(o.join(li, onKey))
    for ((mo, ml) <- Seq((2, 3), (7, 5))) {
      val (oldO, dO) = (o.filter(pmod($"o_orderkey", lit(mo)) =!= 0), o.filter(pmod($"o_orderkey", lit(mo)) === 0))
      val (oldL, dL) = (li.filter(pmod($"l_suppkey", lit(ml)) =!= 0), li.filter(pmod($"l_suppkey", lit(ml)) === 0))
      val refreshed = canon(
        Incremental.refreshJoinView(oldO.join(oldL, onKey), oldO, oldL, dO, dL, onKey))
      assert(refreshed == full, s"split ($mo,$ml) drifted from full re-join")
    }
    // the three delta terms must build-broadcast the DELTA side: no
    // full-table shuffle appears anywhere in the refresh plan
    val (oldO, dO) = (o.filter(pmod($"o_orderkey", lit(2)) =!= 0), o.filter(pmod($"o_orderkey", lit(2)) === 0))
    val (oldL, dL) = (li.filter(pmod($"l_suppkey", lit(3)) =!= 0), li.filter(pmod($"l_suppkey", lit(3)) === 0))
    val plan = physicalPlan(Incremental.joinDelta(oldO, oldL, dO, dL, onKey))
    val bhj = plan.collect { case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j }
    assert(bhj.size == 3, s"all three delta joins must be broadcast hash joins, got ${bhj.size}")
    assert(plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }.isEmpty, "delta maintenance must not shuffle the stored tables")
  }

  test("deterministic shuffle is a reproducible permutation, distinct per salt") {
    val docs = Tables(spark, sfDir).documents
    val e0a = Curation.deterministicShuffle(docs, Seq("doc_id"), "e0").select("doc_id").as[Long].collect().toSeq
    val e0b = Curation.deterministicShuffle(docs, Seq("doc_id"), "e0").select("doc_id").as[Long].collect().toSeq
    val e1  = Curation.deterministicShuffle(docs, Seq("doc_id"), "e1").select("doc_id").as[Long].collect().toSeq
    assert(e0a == e0b, "same salt must reproduce the same order")
    assert(e0a != e1, "different salt must give a different permutation")
    assert(e0a.sorted == e1.sorted, "a shuffle must be a permutation, not a filter")
    assert(e0a != e0a.sorted, "hash order must differ from key order")
  }

  test("orc round-trip preserves schema and values, hostile text included") {
    val df = Seq(
      (1L, "plain"),
      (2L, "comma, \"quote\" and \\ backslash"),
      (3L, "embedded\nnewline\tand tab"),
      (4L, null.asInstanceOf[String])
    ).toDF("id", "text")
    val dir = Files.createTempDirectory("graft_orc_spec").toString + "/t"
    graft.sources.Orc.write(df, dir)
    val back = graft.sources.Orc.read(spark, dir, df.schema)
    // file-format reads are nullable-by-default; names/types must survive
    assert(back.schema.map(f => (f.name, f.dataType)) == df.schema.map(f => (f.name, f.dataType)))
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }
}
