package graft

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Fleet-wide plan regression gate: EVERY registered query's physical
  * plan is audited for nested-loop/cartesian joins — the plan shapes
  * that silently turn a 100 TB job into an O(n·m) non-starter. A new
  * query that accidentally plans one fails here, not in production.
  *
  * Allowlisted queries broadcast a SINGLE-ROW scalar (domain stats,
  * slice totals, aggregate thresholds) — a nested loop over one row is
  * the intended plan for a scalar join, with constant cost. The
  * allowlist is asserted EXACT in both directions so an allowlisted
  * query that stops needing its scalar join gets removed.
  */
class PlanAuditSpec extends SparkSpec {

  private val scalarBroadcastAllowlist = Set(
    "zorder_layout", "zorder_layout3", // 1-row domain-bounds broadcast
    "corpus_drift",                    // 1-row slice-total scalars
    "q11_important_parts",             // scalar aggregate threshold (value concentration)
    "q22_idle_customers",              // scalar avg account balance
    "length_outliers",                 // 1-row percentile-bounds broadcast
    "skew_hotkeys",                    // 1-row total-count scalar broadcast
    "sample_temperature",              // 1-row min-stratum scalar broadcast
    "token_pmi",                       // 1-row bigram-total scalar broadcast
    // bounded-small-side contracts (require-guarded probe sets, ≤16k rows):
    "ann_bruteforce",                  // broadcast probe set vs corpus — the exact baseline
    "eval_retrieval_labels",           // same broadcast probe sweep feeding the label metrics
    "mine_hard_negatives",             // broadcast probe set vs corpus — sub-ceiling top-k
    "ann_range",                       // broadcast probe set vs corpus — radius filter in the scan
    "ann_hamming",                     // broadcast probe codes vs corpus — two-word popcount sweep
    "ann_hamming_rerank",              // same broadcast code sweep feeding the equi-join re-rank
    "ann_asym_rerank",                 // broadcast fixed-point probe vectors vs corpus codes
    "ann_pq",                          // broadcast ADC tables vs encoded corpus
    "dedup_embedding_exact",           // all-pairs oracle baseline (correctness only, never benched at scale)
    "search_bm25",                     // 1-row corpus-stats (N, avgdl) scalar broadcasts (from-scratch query — no index, so no cached scalars)
    // (the INDEX-SERVING entries — search_bm25_served/sql/capped/
    // filtered, search_hybrid_served/filtered, search_mlt[_filtered] —
    // came OFF this list in round 13: cachedStats folds the per-version
    // (n, avgdl) scalars into codegen literals, so their plans no
    // longer carry ANY nested loop. The lifecycle entries
    // (search_bm25_indexed/delta/delete/cdc) eager-materialize via
    // disposeAfter and return a LocalRelation; serve-path plan shape is
    // audited through the InvertedIndexSpec plan pins.)
    "search_hybrid_rrf",               // from-scratch hybrid: inherits bm25's stats scalars + the broadcast probe sweep
    "search_suggest",                  // literal prefix table (3 rows) in a non-equi startsWith join
    "join_cardinality"                 // two 1-row sketch scalars crossed
  )

  test("no registered query plans a nested-loop or cartesian join (scalar broadcasts excepted)") {
    val offenders = scala.collection.mutable.Map.empty[String, String]
    for (q <- Queries.all) {
      try {
        val plan = physicalPlan(q.run(spark, sfDir))
        val bad = plan.collect {
          case j: BroadcastNestedLoopJoinExec => j.nodeName
          case j: CartesianProductExec        => j.nodeName
        }
        if (bad.nonEmpty) offenders(q.name) = bad.mkString(",")
      } catch {
        case e: Throwable => fail(s"${q.name} failed to plan: ${e.getMessage}")
      }
    }
    val unexpected = offenders.keySet -- scalarBroadcastAllowlist
    assert(unexpected.isEmpty,
      s"nested-loop plans outside the scalar allowlist: ${unexpected.map(k => s"$k(${offenders(k)})").mkString("; ")}")
    val stale = scalarBroadcastAllowlist -- offenders.keySet
    assert(stale.isEmpty,
      s"allowlisted queries no longer plan a scalar nested loop (remove them): $stale")
  }

  // ---- large-regime broadcast audit ---------------------------------------

  /** A broadcast subtree is PROVABLY BOUNDED when it carries a
    * structural row bound (limit, scalar aggregate, driver-local
    * relation) or reads only fixed-cardinality dims (nation: 25 rows /
    * region: 5 at every SF, TPC-H semantics). Anything else broadcast
    * under the large regime would grow with the corpus — exactly the
    * 8 GB hard-fail class the round-8 verdict flagged.
    */
  private def provablyBounded(p: org.apache.spark.sql.execution.SparkPlan): Boolean = {
    import org.apache.spark.sql.execution.{CollectLimitExec, FileSourceScanExec, GlobalLimitExec, LocalLimitExec, LocalTableScanExec, RDDScanExec}
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
    val structural = p.collectFirst {
      case _: GlobalLimitExec => ()
      case _: LocalLimitExec => ()
      case _: CollectLimitExec => ()
      case _: LocalTableScanExec => ()
      case _: RDDScanExec => ()
      case a: HashAggregateExec if a.groupingExpressions.isEmpty => ()
      case a: SortAggregateExec if a.groupingExpressions.isEmpty => ()
      case a: ObjectHashAggregateExec if a.groupingExpressions.isEmpty => ()
    }.isDefined
    def boundedLeaf(l: org.apache.spark.sql.execution.SparkPlan): Boolean = l match {
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.forall { rp =>
          val s = rp.toString
          s.contains("nation.parquet") || s.contains("region.parquet")
        }
      case _: LocalTableScanExec | _: RDDScanExec => true
      case _ => false
    }
    structural || { val ls = p.collectLeaves(); ls.nonEmpty && ls.forall(boundedLeaf) }
  }

  /** Grouped-aggregate sides whose cardinality is bounded by a DOMAIN,
    * not the corpus — mechanically they look unbounded (a groupBy over
    * an SF-scaled scan), so each carries its bound here. Asserted
    * exact both ways, like the nested-loop allowlist.
    */
  private val boundedByContract: Map[String, String] = Map(
    // require-guarded probe sets (collect-bounded ≤ maxProbes, Similarity.scala):
    "ann_bruteforce"        -> "broadcast probe set, require-capped",
    "ann_hamming"           -> "broadcast probe codes, require-capped",
    "ann_hamming_rerank"    -> "probe codes + probe vectors, require-capped",
    "ann_asym_rerank"       -> "fixed-point probe vectors, require-capped",
    "ann_lsh"               -> "probe bucket set, require-capped",
    "ann_ivf"               -> "probed-cell set, maxProbes-capped",
    // (ann_ivf_indexed / ann_ivf_filtered / ann_sharded left this list
    // in round 14: topK collects the contract-bounded probes and
    // assigns cells DRIVER-side, so the broadcast side is a
    // LocalTableScan — structurally bounded, no contract needed)
    "ann_range"             -> "broadcast probe set, require-capped",
    "mine_hard_negatives"   -> "broadcast probe set, require-capped",
    "eval_retrieval_labels" -> "probe sweep + probe/candidate label lists, require-capped",
    "search_hybrid_rrf"     -> "probe sweep (dense branch), require-capped",
    // (search_bm25_indexed/delta/delete/cdc left this list in r12: they
    // eager-materialize via disposeAfter, so the audited plan is a
    // LocalRelation; their serve shape is audited via search_bm25_served.
    // search_bm25_served/capped/filtered and search_hybrid_served/
    // filtered left in r16: bm25TopK now collects its contract-bounded
    // probe pairs and serves them as a LocalRelation — the broadcast
    // sides are STRUCTURALLY bounded, like the ANN serves before them)
    // benchmark-suite sides (eval sets are small by their nature):
    "decontaminate"         -> "benchmark shingle set: |benchmark| ≪ corpus by contract",
    "curation_pipeline"     -> "embeds the decontaminate benchmark-shingle side",
    // delta operators (the broadcast side IS the incremental batch):
    "join_incremental"      -> "delta sides: |delta| ≪ history is the operator's premise",
    "scd2_incremental"      -> "delta key set: same premise",
    // domain-bounded grouped aggregates:
    "dsir_weights"          -> "hashed-bigram bucket model: 16^3 = 4096-bucket domain",
    "dsir_select"           -> "same bucket-model sides",
    "dsir_incremental"      -> "same persisted bucket models",
    "winsorize"             -> "per-source percentile bounds: |sources| domain",
    "robust_stats"          -> "per-source median/MAD: |sources| domain",
    "q_concurrency"         -> "two-phase numbering offsets: O(partitions) rows",
    "select_budget"         -> "per-band fences + offsets: O(bands + partitions) rows"
  )

  test("large-regime audit: every broadcast subtree in every registered query is provably bounded") {
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    val offenders = scala.collection.mutable.Map.empty[String, Int]
    withLargeRegime {
      for (q <- Queries.all) {
        try {
          val plan = physicalPlan(q.run(spark, sfDir))
          val bad = plan.collect {
            case b: BroadcastExchangeExec if !provablyBounded(b.child) => b
          }
          if (bad.nonEmpty) offenders(q.name) = bad.size
        } catch {
          case e: Throwable => fail(s"${q.name} failed to plan in the large regime: ${e.getMessage}")
        }
      }
    }
    val unexpected = offenders.keySet -- boundedByContract.keySet
    assert(unexpected.isEmpty,
      s"unbounded broadcast subtrees outside the contract list: ${unexpected.toSeq.sorted.map(k => s"$k(${offenders(k)})").mkString("; ")}")
    val stale = boundedByContract.keySet -- offenders.keySet
    assert(stale.isEmpty,
      s"contract-listed queries no longer plan an unbounded-looking broadcast (remove them): ${stale.toSeq.sorted}")
  }
}
