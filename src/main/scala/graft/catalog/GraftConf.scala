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

  /** Plan-time snapshot to embed in reader/writer factories. */
  def serializable: SerializableConfiguration = new SerializableConfiguration(hadoop)
}
