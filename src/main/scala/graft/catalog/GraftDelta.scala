package graft.catalog

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Merge-on-read row-level operations for Graft tables (Iceberg v2
  * position-delete semantics): instead of rewriting whole files
  * (copy-on-write), a MERGE/UPDATE/DELETE writes
  *  - position deletes `(file, pos)` for removed/replaced rows, and
  *  - new data files for inserted/updated rows,
  * and readers apply the deletes at scan time. Right trade at 100 TB
  * when matched keys are SCATTERED across files: a COW merge would
  * rewrite nearly every file, a delta merge writes O(changes).
  * The cost moves to reads (delete application) until
  * [[GraftMaintenance.compact]] folds deletes back into data files.
  *
  * Spark drives this through `SupportsDelta`: the rewrite plan tags
  * each row with an operation and projects the row id `(_file, _pos)`;
  * updates arrive as delete+insert (`representUpdateAsDeleteAndInsert`).
  */
final class GraftDeltaOperation(table: GraftTable, cmd: RowLevelOperation.Command)
  extends RowLevelOperation with SupportsDelta {

  override def command(): RowLevelOperation.Command = cmd
  override def description(): String = s"GraftDeltaOperation[$cmd]"

  override def rowId(): Array[NamedReference] =
    Array(Expressions.column("_file"), Expressions.column("_pos"))

  override def representUpdateAsDeleteAndInsert(): Boolean = true

  /** The delta read is the table's ordinary delete-aware scan — filters
    * may prune files/rows freely because only changed rows are written.
    */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(table)

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite =
        new GraftDeltaWrite(table, info, s"${cmd.toString.toLowerCase}-delta")
    }
}

final class GraftDeltaWrite(table: GraftTable, info: LogicalWriteInfo, operation: String)
  extends DeltaWrite with DeltaBatchWrite {

  override def toBatch: DeltaBatchWrite = this
  override def description(): String = "GraftDeltaWrite"

  override def createBatchWriterFactory(i: PhysicalWriteInfo): DeltaWriterFactory = {
    val rowIdSchema = info.rowIdSchema().orElseThrow(() =>
      new IllegalStateException("delta write without a rowId schema"))
    GraftDeltaWriterFactory(
      table.tableDir, info.schema(), java.util.UUID.randomUUID().toString,
      table.partitionCols.map(c => info.schema().fieldNames.indexOf(c)).filter(_ >= 0),
      GraftWrite.maxRows(table),
      fileIdOrdinal = rowIdSchema.fieldNames.indexOf("_file"),
      posIdOrdinal = rowIdSchema.fieldNames.indexOf("_pos"),
      serConf = GraftConf.serializable,
      bloomCols = GraftWrite.bloomCols(table), bloomBits = GraftWrite.bloomBits(table))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val (dataEntries, deleteEntries) = messages.collect {
      case m: GraftDeltaCommitMessage => (m.data, m.deletes)
    }.unzip match { case (d, x) => (d.flatten.toSeq, x.flatten.toSeq) }

    val io = new GraftManifestIO(new Path(table.tableDir), GraftConf.hadoop)
    io.commit(operation) { base =>
      val cur = base.getOrElse(throw new GraftCommitConflict("delta write against a dropped table"))
      val live = cur.files.map(_.path).toSet
      val missing = deleteEntries.flatMap(_.targets).toSet -- live
      if (missing.nonEmpty)
        throw new GraftCommitConflict(
          s"delta commit conflicts: deletes target concurrently removed file(s) ${missing.mkString(", ")}")
      GraftManifestIO.Content(
        cur.schema, cur.properties,
        cur.files ++ dataEntries.map(_.copy(seq = GraftManifestIO.PendingSeq)),
        cur.deletes ++ deleteEntries,
        cur.eqDeletes)
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(table.tableDir).getFileSystem(GraftConf.hadoop)
    messages.collect { case m: GraftDeltaCommitMessage =>
      (m.data.map(_.path) ++ m.deletes.map(_.path)).foreach(rel =>
        try fs.delete(new Path(new Path(table.tableDir), rel), false)
        catch { case _: Throwable => () })
    }
  }
}

final case class GraftDeltaCommitMessage(data: Seq[FileEntry], deletes: Seq[DeleteEntry])
  extends WriterCommitMessage

final case class GraftDeltaWriterFactory(
    tableDir: String, schema: StructType, writeId: String, partitionOrdinals: Seq[Int],
    maxRowsPerFile: Long, fileIdOrdinal: Int, posIdOrdinal: Int,
    serConf: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.SerializableConfiguration] = GraftConf.serializable,
    bloomCols: Seq[String] = Nil, bloomBits: Int = GraftBloom.DefaultBits)
  extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new GraftDeltaWriter(tableDir, schema, s"part-$writeId-$partitionId-$taskId",
      partitionOrdinals, maxRowsPerFile, fileIdOrdinal, posIdOrdinal, serConf.value.value,
      bloomCols, bloomBits)
}

/** Inserts go through the ordinary rolling data writer; deletes stream
  * into one position-delete parquet file per task.
  */
final class GraftDeltaWriter(
    tableDir: String, schema: StructType, filePrefix: String, partitionOrdinals: Seq[Int],
    maxRowsPerFile: Long, fileIdOrdinal: Int, posIdOrdinal: Int,
    conf: Configuration = new Configuration(),
    bloomCols: Seq[String] = Nil, bloomBits: Int = GraftBloom.DefaultBits)
  extends DeltaWriter[InternalRow] {

  private val inserts =
    new GraftDataWriter(tableDir, schema, filePrefix, partitionOrdinals, maxRowsPerFile, conf,
      bloomCols, bloomBits)
  private var delWriter: GraftParquetIO.FileWriter = _
  private val delRel = s"deletes/$filePrefix-del.parquet"
  private val delTargets = scala.collection.mutable.LinkedHashSet.empty[String]
  private var delRows = 0L
  private val tableAbs = new Path(tableDir).toString

  override def insert(row: InternalRow): Unit = inserts.write(row)

  override def delete(meta: InternalRow, id: InternalRow): Unit = {
    val abs = id.getUTF8String(fileIdOrdinal).toString
    val pos = id.getLong(posIdOrdinal)
    // _file is the reader's absolute path; deletes store table-relative
    val rel =
      if (abs.startsWith(tableAbs + "/")) abs.substring(tableAbs.length + 1)
      else abs
    delTargets += rel
    if (delWriter == null)
      delWriter = new GraftParquetIO.FileWriter(
        new Path(new Path(tableDir), delRel), GraftDeletes.Schema, conf)
    val r = new GenericInternalRow(2)
    r.update(0, UTF8String.fromString(rel))
    r.update(1, pos)
    delWriter.write(r)
    delRows += 1
  }

  override def update(meta: InternalRow, id: InternalRow, row: InternalRow): Unit = {
    // unreachable with representUpdateAsDeleteAndInsert = true; keep the
    // semantic anyway
    delete(meta, id); insert(row)
  }

  override def commit(): WriterCommitMessage = {
    val dataMsg = inserts.commit().asInstanceOf[GraftCommitMessage]
    val dels =
      if (delWriter == null) Nil
      else {
        delWriter.finish(delRel) // stats don't matter for delete files
        Seq(DeleteEntry(delRel, delRows, delTargets.toSeq))
      }
    GraftDeltaCommitMessage(dataMsg.entries, dels)
  }

  override def abort(): Unit = {
    inserts.abort()
    if (delWriter != null) delWriter.abort()
  }
  override def close(): Unit = ()
}

/** Position-delete codec shared by writers, readers, and compaction. */
object GraftDeletes {
  /** `(file, pos)` — `file` is a table-relative data path. */
  val Schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("pos", LongType, nullable = false)))

  /** Load the sorted deleted positions of `targetRel` from the given
    * delete files (executor-side).
    *
    * Delete files from a broad MERGE target (almost) every live data
    * file, so under sustained change capture a naive
    * parse-per-data-file costs O(data files × total delete mass) —
    * measured super-linear read growth at the 30× scale point (1.4 s →
    * 4.5 s over six accumulation rounds). Delete files are IMMUTABLE
    * once committed (writeId-unique paths; compaction replaces rather
    * than mutates), so each JVM parses a delete file at most once into
    * a per-target position map and serves every later data-file reader
    * from the cache — on a cluster, each executor pays at most one
    * parse per delete file it actually touches, which is the same
    * posture as Iceberg's executor-side delete-loader cache. The cache
    * is LRU-bounded by TOTAL ENTRIES (`graft.delete.cache.max-entries`,
    * default 16M ≈ 128 MB of longs) so delete-heavy tables degrade to
    * re-parsing, never to OOM.
    */
  /** CONTRACT: the returned array is IMMUTABLE — on the single-slice
    * path it is the cache's internal array shared by every reader in
    * the JVM (a defensive copy would defeat the cache for the common
    * one-delete-file case). Callers may only read/binary-search it.
    */
  def positionsFor(deleteFiles: Seq[String], targetRel: String, conf: Configuration): Array[Long] = {
    if (deleteFiles.isEmpty) return Array.emptyLongArray
    val cap = conf.getLong(CacheMaxEntriesKey, CacheMaxEntriesDefault)
    // a delete file whose footer row count exceeds the cache cap can
    // never be cached — materializing its full per-target map would be
    // pure transient memory (and did regress the old bounded streaming
    // path), so over-cap files take the streaming single-target filter
    def slice(df: String): Option[Array[Long]] =
      if (footerRows(df, conf) > cap) {
        val a = streamPositions(df, targetRel, conf)
        if (a.isEmpty) None else Some(a)
      } else parsed(df, conf).get(targetRel)
    val slices = deleteFiles.flatMap(slice)
    if (slices.isEmpty) Array.emptyLongArray
    else if (slices.size == 1) slices.head
    else sortedDistinct(Array.concat(slices: _*))
  }

  /** Primitive in-place sort + dedup (the position arrays run to
    * millions of entries at scale; `.distinct.sorted` would box every
    * long through an Ordering).
    */
  private def sortedDistinct(xs: Array[Long]): Array[Long] = {
    if (xs.length <= 1) return xs
    java.util.Arrays.sort(xs)
    var w = 1
    var i = 1
    while (i < xs.length) {
      if (xs(i) != xs(w - 1)) { xs(w) = xs(i); w += 1 }
      i += 1
    }
    if (w == xs.length) xs else java.util.Arrays.copyOf(xs, w)
  }

  /** One streaming pass over a delete file's (file, pos) entries —
    * the shared read loop under both the single-target filter and the
    * full-map parse (also the parseCount tap point).
    */
  private def foreachEntry(deleteFile: String, conf: Configuration)(
      f: (String, Long) => Unit): Unit = {
    parseCount.incrementAndGet()
    val r = new GraftParquetIO.FileReader(new Path(deleteFile), Schema, conf)
    try {
      var row = r.next()
      while (row != null) {
        f(row.getUTF8String(0).toString, row.getLong(1))
        row = r.next()
      }
    } finally r.close()
  }

  // ---- executor-side parsed-delete-file cache ---------------------------

  val CacheMaxEntriesKey = "graft.delete.cache.max-entries"
  val CacheMaxEntriesDefault = 16L * 1024 * 1024

  private final case class Cached(entries: Long, byTarget: Map[String, Array[Long]])
  private val cache = new java.util.LinkedHashMap[String, Cached](16, 0.75f, true)
  private var cachedEntries = 0L

  /** Full-file parses performed (test observability: the O(data files ×
    * delete mass) regression shows as this counter scaling with data
    * files instead of delete files).
    */
  val parseCount = new java.util.concurrent.atomic.AtomicLong(0L)

  def cacheClear(): Unit = cache.synchronized {
    cache.clear(); cachedEntries = 0L
    // footer-count memo shares the delete-file lifecycle: without this,
    // long-lived executors accumulate entries for delete files already
    // removed by compaction
    rowCounts.clear()
  }

  // cold-start parse dedup: without it, every concurrent task on a
  // fresh executor parses the same delete files in one wave (measured
  // cores× redundant work on the first read after a commit) — the
  // first caller parses, the rest join its future
  private val inFlight = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.CompletableFuture[Map[String, Array[Long]]]]()

  private def parsed(deleteFile: String, conf: Configuration): Map[String, Array[Long]] = {
    cache.synchronized {
      val hit = cache.get(deleteFile)
      if (hit != null) return hit.byTarget
    }
    val fut  = new java.util.concurrent.CompletableFuture[Map[String, Array[Long]]]()
    val prev = inFlight.putIfAbsent(deleteFile, fut)
    if (prev != null) {
      // unwrap so joiners see the SAME exception type as the parsing
      // thread (an outer retry/error classifier must not treat the
      // same root cause differently per thread)
      try return prev.join()
      catch {
        case e: java.util.concurrent.CompletionException =>
          throw Option(e.getCause).getOrElse(e)
      }
    }
    try {
      // re-check under ownership: a finishing parser caches BEFORE
      // removing its in-flight entry, so a miss here means we parse
      cache.synchronized {
        val hit = cache.get(deleteFile)
        if (hit != null) { fut.complete(hit.byTarget); return hit.byTarget }
      }
      val result = parseFile(deleteFile, conf)
      fut.complete(result)
      result
    } catch {
      case e: Throwable => fut.completeExceptionally(e); throw e
    } finally inFlight.remove(deleteFile)
  }

  // footer row counts are tiny and immutable — memoize so the over-cap
  // routing check doesn't re-open footers per data-file reader
  private val rowCounts = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private def footerRows(deleteFile: String, conf: Configuration): Long =
    rowCounts.computeIfAbsent(deleteFile, _ => {
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(new Path(deleteFile), conf))
      try Long.box(r.getRecordCount) finally r.close()
    })

  /** Streaming single-target filter (bounded memory: buffers only the
    * positions matching `targetRel`) — the path for delete files too
    * big to cache.
    */
  private def streamPositions(deleteFile: String, targetRel: String,
      conf: Configuration): Array[Long] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
    foreachEntry(deleteFile, conf)((rel, pos) => if (rel == targetRel) buf += pos)
    sortedDistinct(buf.toArray)
  }

  // parse OUTSIDE the cache lock: serializing every reader behind one
  // file scan would stall unrelated files' readers
  private def parseFile(deleteFile: String, conf: Configuration): Map[String, Array[Long]] = {
    val byTarget = scala.collection.mutable.HashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[Long]]
    var n = 0L
    foreachEntry(deleteFile, conf) { (rel, pos) =>
      byTarget.getOrElseUpdate(rel,
        scala.collection.mutable.ArrayBuffer.empty[Long]) += pos
      n += 1
    }
    val result = byTarget.iterator.map { case (t, b) => (t, sortedDistinct(b.toArray)) }.toMap
    val cap = conf.getLong(CacheMaxEntriesKey, CacheMaxEntriesDefault)
    cache.synchronized {
      if (n <= cap && !cache.containsKey(deleteFile)) {
        cachedEntries += n
        cache.put(deleteFile, Cached(n, result))
        // LRU-evict (access-ordered map: iterator yields oldest first)
        val it = cache.entrySet().iterator()
        while (cachedEntries > cap && it.hasNext) {
          val e = it.next()
          if (e.getKey != deleteFile) { cachedEntries -= e.getValue.entries; it.remove() }
        }
      }
    }
    result
  }
}
