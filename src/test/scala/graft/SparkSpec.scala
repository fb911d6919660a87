package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  val sfDir = "/root/testdata/sf0.001"

  /** Physical plan with the AQE wrapper stripped: `executedPlan` returns
    * an `AdaptiveSparkPlanExec` LEAF, so a naive `plan.collect` never
    * sees the real operators and node-type assertions pass vacuously.
    */
  def physicalPlan(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.execution.SparkPlan =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }

  /** Plan under the 100 TB regime: the ScaleSafe gate refuses every
    * SF-proportional hint (cap=0) and runtime stats are too big to
    * auto-broadcast (threshold=-1). Clears the cache first — earlier
    * tests' persist()ed intermediates would otherwise substitute their
    * small-regime physical plans (broadcasts baked in) — and restores
    * everything after.
    */
  def withLargeRegime[A](f: => A): A = {
    val conf = spark.conf
    conf.set(graft.operators.ScaleSafe.MaxBytesKey, "0")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // AQE re-plans with its OWN threshold: without this, executed
    // large-regime assertions could still see runtime broadcast
    // conversions the pre-AQE plan string hides
    conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.catalog.clearCache()
    try f finally {
      conf.unset(graft.operators.ScaleSafe.MaxBytesKey)
      conf.unset("spark.sql.autoBroadcastJoinThreshold")
      conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.catalog.clearCache()
    }
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_warehouse").toString)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // unsound in Spark 4.1 — see GraftSession for the full account
      .config("spark.sql.unionOutputPartitioning", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
