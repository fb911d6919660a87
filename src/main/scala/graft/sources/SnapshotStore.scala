package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A minimal snapshotted table layout over plain parquet — the engine's
  * stand-in for the reference's Iceberg target (no Iceberg jars in this
  * container). Semantics modeled on the Iceberg operations the reference
  * invokes: snapshot commit, time travel, snapshot expiration
  * (`targetSnapshotExpirationSettings`) and orphan file removal
  * (`targetOrphanFilesExpirationSettings`),
  * /root/reference/stream-spec-yaml-example.yaml:49-61.
  *
  * Layout:
  * {{{
  *   tableDir/
  *     data/v<N>/part-*.parquet     one immutable dir per snapshot
  *     manifests/v<N>.manifest      newline list of relative data paths
  *     VERSION                      current version number (atomic rename)
  * }}}
  *
  * Writers never mutate old snapshots, so concurrent readers of version
  * N are unaffected by a commit of N+1 — the same isolation property the
  * Iceberg target gives the reference. All metadata ops are driver-side
  * and O(#files); the data itself moves only through executor-side
  * distributed writes.
  */
final class SnapshotStore(spark: SparkSession, tableDir: String) {
  private val root = new Path(tableDir)
  private def fs   = root.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versionFile    = new Path(root, "VERSION")
  private def dataDir(v: Long)     = new Path(root, s"data/v$v")
  private def manifestFile(v: Long) = new Path(root, s"manifests/v$v.manifest")

  def currentVersion(): Option[Long] =
    if (!fs.exists(versionFile)) None
    else {
      val in = fs.open(versionFile)
      try Some(new String(in.readAllBytes(), "UTF-8").trim.toLong)
      finally in.close()
    }

  /** Commit `df` as the next snapshot; returns the new version.
    * `retry` bounds transient commit failures (the reference's merge
    * client `queryRetryMaxAttempts`/`queryRetryBaseDuration`): a failed
    * attempt never advanced VERSION, so the re-attempt recomputes the
    * same version and overwrites the same (incomplete) data dir —
    * retrying the whole commit is idempotent.
    */
  def commit(
      df: DataFrame, maxRowsPerFile: Option[Int] = None,
      retry: graft.streaming.RetryPolicy = graft.streaming.RetryPolicy.Never
  ): Long = commitChecked(df, maxRowsPerFile, retry, expected = None)

  /** Shared commit body. `expected = Some(exp)` enables OCC: the
    * expectation is re-validated both at attempt start (cheap fail
    * before staging) and again IMMEDIATELY before the manifest/pointer
    * flip — shrinking the unguarded race window from the full
    * (possibly long) distributed data write down to the two atomic
    * renames. A conflict under a retrying policy re-fails the attempt
    * at the pre-stage check, so retries never re-stage data.
    */
  private def commitChecked(
      df: DataFrame, maxRowsPerFile: Option[Int],
      retry: graft.streaming.RetryPolicy, expected: Option[Option[Long]]
  ): Long = {
    def occCheck(): Unit = expected.foreach { exp =>
      val cur = currentVersion()
      if (cur != exp) throw new SnapshotStore.CommitConflictException(exp, cur)
    }
    graft.streaming.Retry.withRetry(retry) {
      occCheck()
      val v = currentVersion().getOrElse(0L) + 1
      val writer = maxRowsPerFile.foldLeft(df.write.mode("overwrite"))(
        (w, n) => w.option("maxRecordsPerFile", n.toLong))
      writer.parquet(dataDir(v).toString)

      val files = fs.listStatus(dataDir(v))
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(s => s"data/v$v/${s.getPath.getName}")
        .sorted
      fs.mkdirs(new Path(root, "manifests"))
      occCheck() // re-validate at the flip, not just before staging
      writeAtomic(manifestFile(v), files.mkString("\n"))
      writeAtomic(versionFile, v.toString)
      v
    }
  }

  /** Optimistic-concurrency commit — the table-format semantic behind
    * Iceberg's commit protocol: the caller states the version it BASED
    * its write on (`None` = expects an empty table); if another writer
    * has advanced the table since, the commit is refused with a
    * [[SnapshotStore.CommitConflictException]] BEFORE any data is
    * staged, and the caller re-reads + re-derives + retries. Plain
    * [[commit]] keeps last-writer-wins semantics for single-writer
    * streams; concurrent writers (compaction beside ingestion, two
    * backfill shards racing) use this. The expectation is validated
    * twice: before staging (cheap fail) and again immediately before
    * the manifest/pointer flip, so the unguarded window is just the two
    * atomic renames — not the full data write. A race inside that final
    * sliver can still slip through on a filesystem without atomic
    * compare-and-swap — exactly Iceberg's exposure without a locking
    * catalog, which is why production deployments put a catalog in
    * front; single-writer correctness and conflict DETECTION are what
    * this layer guarantees.
    */
  def commitIf(df: DataFrame, expectedVersion: Option[Long],
      maxRowsPerFile: Option[Int] = None,
      retry: graft.streaming.RetryPolicy = graft.streaming.RetryPolicy.Never): Long =
    commitChecked(df, maxRowsPerFile, retry, Some(expectedVersion))

  /** Read the current snapshot (None if the table has no commits). */
  def read(): Option[DataFrame] = currentVersion().map(readVersion)

  /** Time travel: read snapshot `v` as of its commit. A snapshot's data
    * dir is immutable once VERSION advances past it, so its parquet
    * schema is cached per (tableDir, v) — read.parquet without a schema
    * launches a footer-inference Spark job, one dead job per micro-batch
    * for the streaming readers that re-open the base snapshot each cycle.
    */
  def readVersion(v: Long): DataFrame = {
    val paths = manifestPaths(v)
    // the manifest's mtime keys out a wiped-and-recreated table that
    // reuses version numbers at the same path (one driver getFileStatus,
    // never a job)
    val key = (tableDir, v, fs.getFileStatus(manifestFile(v)).getModificationTime)
    val cached = SnapshotStore.schemaCache.get(key)
    val schema = if (cached != null) cached else {
      val s = spark.read.parquet(paths: _*).schema
      if (SnapshotStore.schemaCache.size >= SnapshotStore.SchemaCacheMax)
        SnapshotStore.schemaCache.clear()
      SnapshotStore.schemaCache.put(key, s)
      s
    }
    spark.read.schema(schema).parquet(paths: _*)
  }

  def versions(): Seq[Long] =
    if (!fs.exists(new Path(root, "manifests"))) Seq.empty
    else
      fs.listStatus(new Path(root, "manifests"))
        .map(_.getPath.getName)
        .collect { case n if n.endsWith(".manifest") => n.stripPrefix("v").stripSuffix(".manifest").toLong }
        .sorted.toSeq

  /** Expire old snapshots, keeping the most recent `keepLast` — the
    * reference's snapshot expiration. Data dirs of expired versions are
    * deleted with their manifests.
    */
  def expireSnapshots(keepLast: Int): Seq[Long] = {
    val vs      = versions()
    val expired = vs.dropRight(math.max(keepLast, 1))
    expired.foreach { v =>
      fs.delete(dataDir(v), true)
      fs.delete(manifestFile(v), false)
    }
    expired
  }

  /** Delete data files not referenced by any live manifest — the
    * reference's orphan file removal. Returns the deleted paths.
    */
  def removeOrphanFiles(): Seq[String] = {
    // qualify both sides: listStatus returns scheme-qualified paths while
    // manifests store table-relative ones
    val live = versions().flatMap(v => manifestPaths(v))
      .map(p => fs.makeQualified(new Path(p)).toString).toSet
    val dataRoot = new Path(root, "data")
    if (!fs.exists(dataRoot)) return Seq.empty
    val all = fs.listStatus(dataRoot).filter(_.isDirectory).flatMap { d =>
      fs.listStatus(d.getPath).filter(_.isFile).map(_.getPath)
    }
    val orphans = all.filterNot(p => live.contains(fs.makeQualified(p).toString))
    orphans.foreach(p => fs.delete(p, false))
    // drop now-empty snapshot dirs
    fs.listStatus(dataRoot).filter(_.isDirectory)
      .filter(d => fs.listStatus(d.getPath).isEmpty)
      .foreach(d => fs.delete(d.getPath, false))
    orphans.map(_.toString).toSeq
  }

  private def manifestPaths(v: Long): Seq[String] = {
    val in = fs.open(manifestFile(v))
    val body = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    body.linesIterator.filter(_.nonEmpty).map(rel => new Path(root, rel).toString).toSeq
  }

  private def writeAtomic(path: Path, content: String): Unit = {
    val tmp = new Path(path.getParent, path.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    fs.delete(path, false)
    fs.rename(tmp, path)
  }
}

object SnapshotStore {
  /** Per-process schema cache for immutable snapshot versions, keyed
    * (tableDir, version, manifest mtime); clear-on-overflow bounded.
    */
  private val SchemaCacheMax = 256
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Long, Long), org.apache.spark.sql.types.StructType]()

  /** The table advanced since the caller's base version — re-read,
    * re-derive, retry (the optimistic-concurrency contract).
    */
  final class CommitConflictException(expected: Option[Long], actual: Option[Long])
    extends RuntimeException(
      s"commit conflict: expected version ${expected.getOrElse("none")}, " +
        s"table is at ${actual.getOrElse("none")}")
}
