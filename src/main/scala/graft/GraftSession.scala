package graft

import org.apache.spark.sql.SparkSession

/** Production-shaped session builder: the config every graft deployment
  * wants — AQE with skew-join handling, graft's SQL
  * functions/strategies, UTC, and shuffle parallelism sized to the
  * cluster (cores here; executors×cores in production).
  */
object GraftSession {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // runtime-MEASURED broadcast decisions get more headroom than
      // estimate-based ones: aggregate-derived sides (vocab counts,
      // grouped models) defeat plan-time size estimates, so when the
      // ScaleSafe gate conservatively declines a hint, AQE may still
      // convert the join using the side's ACTUAL materialized size —
      // 64 MiB is far under the 8 GB broadcast hard limit and cheap
      // for any executor that can run this engine
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
      // InferFiltersFromGenerate clones every generator expression into
      // a Filter (size(e) > 0 AND isnotnull(e)) that predicate pushdown
      // then inlines down to the scan — so every explode(tokens(...)) /
      // explode(wordShingles(...)) pays its regex-split / shingle
      // assembly TWICE per row (once in the scan filter, once in the
      // generator). The filter never prunes storage here (it is not a
      // source filter) and Generate itself already skips empty/null
      // arrays with identical semantics, so excluding the rule is
      // result-neutral and removes a full tokenize pass from every
      // explode-shaped text operator. NOTE the exclusion is
      // SESSION-GLOBAL: generators over raw parquet array columns
      // (e.g. posexplode over a stored features array) also lose the
      // inferred isnotnull/size filter — benign here because Generate
      // drops those rows in the same stage and the test corpora carry
      // no null/empty arrays; a deployment with sparse array columns
      // should scope the mitigation to the text operators instead.
      // SPARK_GRAFT_EXCLUDED_RULES is a dev-only A/B override (unset in
      // every driver/production path).
      .config("spark.sql.optimizer.excludedRules",
        sys.env.getOrElse("SPARK_GRAFT_EXCLUDED_RULES",
          "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"))
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // static conf: the default 100-entry whole-stage-codegen class
      // cache thrashes when a workload cycles through >100 distinct
      // plans (the 175-query bench board re-pays Janino compilation
      // every pass); a long-lived cluster wants all its plans warm
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      // Spark 4.1's union-partitioning claim is UNSOUND in this build:
      // UnionExec.outputPartitioning reports the children's common
      // hash partitioning (N partitions) while doExecute concatenates
      // via sc.union (sum-of-children partitions), and under AQE
      // exchange reuse the two copies of a union subtree can even
      // materialize DIFFERENT physical partition counts — a downstream
      // SortMergeJoin that trusted the claim zips its children and
      // dies with "Can't zip RDDs with unequal numbers of partitions"
      // (observed on a CDC batch assembled as updates ∪ inserts from
      // co-repartitioned branches). One skipped exchange is not worth
      // a plan that crashes — or worse — at scale; claim the default
      // partitioning and let EnsureRequirements place real shuffles.
      .config("spark.sql.unionOutputPartitioning", "false")
}
