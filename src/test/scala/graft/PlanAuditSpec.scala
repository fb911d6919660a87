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
    "search_bm25",                     // 1-row corpus-stats (N, avgdl) scalar broadcasts
    "search_hybrid_rrf",               // inherits bm25's stats scalars + the broadcast probe sweep
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
}
