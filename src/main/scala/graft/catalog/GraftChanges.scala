package graft.catalog

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Change-data feed between two snapshots of a Graft table — the
  * format-level equivalent of Delta's CDF / Iceberg's changelog scan,
  * built from the manifest diff:
  *
  *  1. Only files whose membership or delete set CHANGED between the
  *     two versions are read — rows in untouched files with untouched
  *     deletes cannot differ, so a 100 TB table with a one-partition
  *     merge reads one partition's files, not the table.
  *  2. Copy-on-write rewrites carry over unchanged rows into new
  *     files; `EXCEPT ALL` multiset reconciliation cancels them, so
  *     the feed contains exactly the NET row changes: an update
  *     appears as delete + insert, a carried-over row not at all.
  *
  * Output: the table's columns plus `_change_type` ('insert' |
  * 'delete').
  */
object GraftChanges {

  def between(spark: SparkSession, tableDir: String, fromVersion: Long, toVersion: Long): DataFrame = {
    val io = new GraftManifestIO(new Path(tableDir), GraftConf.hadoop)
    val from = io.readSnapshot(fromVersion)
    val to = io.readSnapshot(toVersion)
    require(from.schema == to.schema,
      "change feed across a schema evolution is not supported; diff within one schema epoch")

    // a file contributes changes if it joined/left the snapshot or its
    // applicable delete set (position OR equality) changed
    def deleteKey(s: GraftSnapshot, e: FileEntry): (Set[String], Set[String]) =
      (s.deletesFor(e.path).map(_.path).toSet, s.eqDeletesFor(e).map(_.path).toSet)
    val fromByPath = from.files.map(f => f.path -> f).toMap
    val toByPath = to.files.map(f => f.path -> f).toMap
    val changed = (fromByPath.keySet ++ toByPath.keySet).filter { p =>
      !fromByPath.contains(p) || !toByPath.contains(p) ||
        deleteKey(from, fromByPath(p)) != deleteKey(to, toByPath(p))
    }

    def liveRows(s: GraftSnapshot): DataFrame = {
      val files = s.files.filter(f => changed.contains(f.path))
      if (files.isEmpty)
        return spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s.schema)
      GraftMaintenance.readThroughDeletes(spark, tableDir, s.schema, files,
        files.flatMap(f => s.deletesFor(f.path)).distinct,
        s.eqDeletes.filter(d => files.exists(_.seq < d.seq)))
    }

    val before = liveRows(from)
    val after = liveRows(to)
    after.exceptAll(before).withColumn("_change_type", lit("insert"))
      .unionByName(before.exceptAll(after).withColumn("_change_type", lit("delete")))
  }
}
