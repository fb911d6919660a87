package graft.catalog

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.SerializableConfiguration

/** Hadoop configuration plumbing for the Graft format.
  *
  * Catalog and commit I/O previously built bare `new Configuration()`s,
  * which silently drop every `fs.*` setting the user gave the Spark
  * session — object-store endpoints, credentials, custom FileSystem
  * registrations (`fs.s3x.impl`). On a laptop against `file://` that is
  * invisible; on any real deployment it breaks all non-default
  * filesystems. Two rules, mirroring Spark's own datasources:
  *
  *   - driver-side I/O (manifest commits, maintenance, catalog listing)
  *     uses [[hadoop]] — the live session conf;
  *   - executor-side I/O (partition readers, data/delete writers) must
  *     receive a [[serializable]] snapshot taken at PLAN time, because
  *     `SparkSession.getActiveSession` is empty on remote executors.
  */
object GraftConf {

  /** The active session's Hadoop conf when one exists in this JVM
    * (driver, or any thread of a local-mode run); a bare Configuration
    * as the last resort (tests poking the format without a session).
    */
  def hadoop: Configuration =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  /** Plan-time snapshot to embed in reader/writer factories.
    *
    * Broadcast, not inline: an inline `SerializableConfiguration` field
    * re-serializes the full conf XML into EVERY task closure (measured
    * 1.0 → 1.8 s on the catalog MERGE path); a broadcast ships it once
    * per plan and tasks share the deserialized copy — the same pattern
    * as Spark's own `FileSourceScanExec.broadcastedHadoopConf`. Created
    * at plan time, so later session-conf mutations still reach the next
    * query's plan.
    */
  def serializable: org.apache.spark.broadcast.Broadcast[SerializableConfiguration] =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession) match {
      case Some(s) => s.sparkContext.broadcast(new SerializableConfiguration(hadoop))
      case None => throw new IllegalStateException(
        "no active Spark session to broadcast Hadoop conf from")
    }
}
