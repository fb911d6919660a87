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
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // static conf: the default 100-entry whole-stage-codegen class
      // cache thrashes when a workload cycles through >100 distinct
      // plans (the 175-query bench board re-pays Janino compilation
      // every pass); a long-lived cluster wants all its plans warm
      .config("spark.sql.codegen.cache.maxEntries", "5000")
}
