package graft.catalog

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.types.StructType

/** Micro-batch streaming source over a Graft table
  * (`spark.readStream.table("graft.db.t")`): each batch is the set of
  * data files ADDED between two snapshot versions — together with
  * [[graft.streaming.GraftStreamSink]] this closes the reference's
  * full loop (stream out of a versioned table, stream into one;
  * reference main.scala streams a versioned source into Iceberg).
  *
  * Semantics match Delta's table streaming:
  *  - append commits (INSERT / stream-append / CTAS data) stream their
  *    new files exactly once, tracked by snapshot version offsets that
  *    survive restarts via the checkpoint;
  *  - a non-append commit in the offset range (MERGE / UPDATE /
  *    DELETE / compact / zorder / overwrite) fails the stream with a
  *    clear error unless `ignoreChanges=true`, which streams the
  *    commit's ADDED files (rewritten rows re-deliver — at-least-once,
  *    exactly Delta's documented `ignoreChanges` contract);
  *  - offsets name manifest versions, so expired snapshots inside an
  *    active offset range fail loudly rather than skip data.
  */
final class GraftMicroBatchStream(
    tableDir: String, schema: StructType, ignoreChanges: Boolean)
  extends MicroBatchStream {

  private def io = new GraftManifestIO(new Path(tableDir), GraftConf.hadoop)

  override def initialOffset(): Offset = GraftStreamOffset(0L)

  override def latestOffset(): Offset =
    GraftStreamOffset(io.currentVersion().getOrElse(0L))

  override def deserializeOffset(json: String): Offset =
    GraftStreamOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[GraftStreamOffset].version
    val to = end.asInstanceOf[GraftStreamOffset].version
    if (to <= from) return Array.empty
    val versions = io.versions()
    val range = (from + 1) to to
    val missing = range.filterNot(versions.contains)
    if (missing.nonEmpty)
      throw new IllegalStateException(
        s"snapshot(s) v${missing.mkString(",v")} expired while an active stream still " +
          s"needed them — raise expire_snapshots keep_last above the stream's lag")

    // alter changes no files; overwrite/row-level/maintenance REMOVE
    // files and need ignoreChanges
    val appendOps = Set("append", "stream-append", "create", "alter")
    val nonAppend = range.map(v => (v, io.readSnapshot(v).operation))
      .filter { case (_, op) => !appendOps.contains(op) }
    if (nonAppend.nonEmpty && !ignoreChanges)
      throw new IllegalStateException(
        s"non-append commit(s) in stream range: ${nonAppend.map { case (v, op) => s"v$v=$op" }.mkString(", ")} " +
          "— row-level/maintenance rewrites cannot stream exactly-once; " +
          "set option ignoreChanges=true to stream their added files (at-least-once)")

    val before = if (from == 0) Set.empty[String]
      else io.readSnapshot(from).files.map(_.path).toSet
    val after = io.readSnapshot(to)
    val added = after.files.filterNot(f => before.contains(f.path))
    added.map { f =>
      GraftInputPartition(
        Seq((new Path(new Path(tableDir), f.path).toString, f.path, GraftReadDeletes())), None): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftReaderFactory(schema,
      schema.fieldNames.indexOf("_file"), schema.fieldNames.indexOf("_pos"),
      GraftConf.serializable)

  override def commit(end: Offset): Unit = () // offsets live in the checkpoint
  override def stop(): Unit = ()
  override def toString: String = s"GraftMicroBatchStream[$tableDir]"
}

final case class GraftStreamOffset(version: Long) extends Offset {
  override def json(): String = version.toString
}
