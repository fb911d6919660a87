package graft.operators

import org.apache.spark.sql.SparkSession

/** Shared manifest-commit machinery for persisted serving indexes
  * ([[InvertedIndex]], [[AnnIndex]]): versioned JSON manifests under
  * `dir/manifest/v<N>.json`, claimed by ATOMIC EXCLUSIVE CREATE — the
  * same protocol as [[graft.catalog.GraftManifestIO]] (O_EXCL via
  * java.nio locally, create-no-overwrite on HDFS-likes; object stores
  * without atomic create need a locking catalog in front). Exactly one
  * racing maintainer wins a version; a crash before the claim leaves
  * only invisible orphans.
  */
private[graft] object IndexManifests {

  def fs(spark: SparkSession, dir: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  def manifestPath(dir: String, v: Long) =
    new org.apache.hadoop.fs.Path(s"$dir/manifest/v$v.json")

  /** Committed versions, ascending; the listing is authoritative. */
  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/manifest")
    val f = fs(spark, dir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripPrefix("v").stripSuffix(".json").toLong }
      .sorted.toSeq
  }

  /** Kind-sniff a committed index root: ANN manifests carry the
    * `centroids` field, lexical ones don't. The ONE dispatch every
    * kind-agnostic surface (procedures, federation export, reshard)
    * shares — a manifest-shape change lands here once.
    */
  def isAnnManifest(spark: SparkSession, dir: String): Boolean = {
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no committed serving index at $dir")
    (org.json4s.jackson.JsonMethods.parse(readBody(spark, dir, vs.last))
      \ "centroids") != org.json4s.JNothing
  }

  /** Read manifest `v`'s body. A manifest becomes visible at exclusive
    * create, microseconds before its bytes land — retry the (local-FS)
    * sliver.
    */
  def readBody(spark: SparkSession, dir: String, v: Long): String = {
    var last: Throwable = null
    for (_ <- 1 to 5) {
      try {
        val in = fs(spark, dir).open(manifestPath(dir, v))
        try return new String(in.readAllBytes(), "UTF-8") finally in.close()
      } catch { case t: Throwable => last = t; Thread.sleep(10) }
    }
    throw last
  }

  /** Atomically claim manifest `v` with `body`; false = lost the race.
    * Hadoop's local create(overwrite=false) is check-then-create, not
    * O_EXCL — java.nio CREATE_NEW is the true atomic claim locally.
    */
  def tryCommit(spark: SparkSession, dir: String, v: Long, body: String): Boolean = {
    val f = fs(spark, dir)
    f.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/manifest"))
    exclusiveCreate(f, manifestPath(dir, v), body)
  }

  /** TRUE atomic exclusive-create of a small marker/manifest file —
    * Hadoop's local fs.create(p, false) is check-then-create (two
    * racers can both succeed, the second silently truncating the
    * first), so the local scheme goes through java.nio CREATE_NEW.
    * Shared by manifest claims and the federation's layout overlays.
    */
  def exclusiveCreate(f: org.apache.hadoop.fs.FileSystem,
      target: org.apache.hadoop.fs.Path, body: String): Boolean = {
    val bytes = body.getBytes("UTF-8")
    if (f.getScheme == "file") {
      try {
        val nio = java.nio.file.Paths.get(target.toUri.getPath)
        val ch = java.nio.file.Files.newByteChannel(nio,
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
        try ch.write(java.nio.ByteBuffer.wrap(bytes)) finally ch.close()
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } else {
      try {
        val out = f.create(target, false)
        try out.write(bytes) finally out.close()
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case e: java.io.IOException if e.getMessage != null &&
          e.getMessage.toLowerCase.contains("exist") => false
      }
    }
  }

  /** Per-process cache of PARSED manifests, keyed (dir, version).
    * Manifests are immutable once committed (every mutation claims a
    * NEW version; rollback re-commits old content as a new head), so
    * the cache can never serve stale content — only spare the
    * read+parse. That matters at serving QPS on a large index: the
    * manifest JSON grows with the file count (tokRanges pins two
    * strings per postings file), and without the cache every query
    * re-reads and re-parses it. Bounded FIFO-ish eviction keeps test
    * churn (thousands of temp indexes per JVM) from pinning memory.
    */
  private val ManifestCacheMax = 256
  private val manifestCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), AnyRef]()
  // per-dir generation: bumped by invalidate() so a reader that raced a
  // wipe+rebuild (read the OLD body, stalled, resumed after the
  // invalidation) cannot re-poison the cache with its stale parse
  private val dirGen =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Drop every cached manifest under `dir` — called by build(): an
    * index dir deleted and rebuilt at the SAME path within one JVM
    * would otherwise serve the old tree's parsed manifest for
    * (dir, version). Mutations never need this (each claims a NEW
    * version); only a from-scratch build reuses version numbers.
    */
  def invalidate(dir: String): Unit = {
    dirGen.merge(dir, java.lang.Long.valueOf(1L), (a, b) => java.lang.Long.valueOf(a + b))
    val it = manifestCache.keySet.iterator()
    while (it.hasNext) if (it.next()._1 == dir) it.remove()
    val st = statsCache.keySet.iterator()
    while (st.hasNext) if (st.next()._1 == dir) st.remove()
    val td = termDfCache.keySet.iterator()
    while (td.hasNext) if (td.next()._1 == dir) td.remove()
  }

  def cachedManifest[A <: AnyRef](spark: SparkSession, dir: String, v: Long)(
      parse: String => A): A = {
    val key = (dir, v)
    val hit = manifestCache.get(key)
    if (hit != null) return hit.asInstanceOf[A]
    val gen = dirGen.get(dir)
    val parsed = parse(readBody(spark, dir, v))
    if (manifestCache.size >= ManifestCacheMax) manifestCache.clear()
    // only cache if no invalidation raced the read — a stale parse may
    // be RETURNED once (the caller read a then-live manifest) but must
    // never be REMEMBERED past the dir's invalidation
    if (java.util.Objects.equals(dirGen.get(dir), gen)) manifestCache.put(key, parsed)
    parsed
  }

  /** Per-process cache of the corpus stats SCALARS (n, sumdl), keyed
    * (dir, stats rel path). Every mutation that changes them writes a
    * FRESH UUID-named stats dir and commits a new manifest referencing
    * it, so the pair under one key is immutable — the cache can never
    * serve stale numbers, only spare the one-row aggregate job every
    * BM25 serve/df-cap/MLT-selection otherwise launches per query.
    * At interactive concurrency that job was the measured ceiling
    * (BENCH_SF1 round-13 addendum 4): clients multiply executors, not
    * driver job dispatch. Same generation guard as the manifest cache
    * (export/rebuild into a wiped dir reuses rel paths; invalidate()
    * covers it).
    */
  private val statsCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), (Long, Long)]()

  /** Write the one-row stats sidecar FROM DRIVER SCALARS and prime the
    * stats cache for it. Every mutation knows (n, sumdl) exactly at
    * commit time (base scalars from [[cachedStats]] plus the batch's
    * collected delta), so the former distributed merge job — a read of
    * the base stats parquet unioned/cross-joined with aggregate
    * broadcasts — collapses to one local-relation write (a 1-task job),
    * and the NEXT serve's stats lookup is a cache hit instead of a
    * read. The gen guard mirrors [[cachedManifest]]: a prime racing an
    * invalidate() must not be remembered past it.
    */
  def writeStats(spark: SparkSession, dir: String, statsRel: String,
      n: Long, sumdl: Long): Unit = {
    val gen = dirGen.get(dir)
    spark.createDataFrame(
      java.util.Collections.singletonList(org.apache.spark.sql.Row(n, sumdl)),
      org.apache.spark.sql.types.StructType.fromDDL("n BIGINT, sumdl BIGINT"))
      .coalesce(1).write.mode("errorifexists").parquet(s"$dir/$statsRel")
    if (statsCache.size >= ManifestCacheMax) statsCache.clear()
    if (java.util.Objects.equals(dirGen.get(dir), gen))
      statsCache.put((dir, statsRel), (n, sumdl))
  }

  def cachedStats(spark: SparkSession, dir: String, statsRel: String): (Long, Long) = {
    val key = (dir, statsRel)
    val hit = statsCache.get(key)
    if (hit != null) return hit
    val gen = dirGen.get(dir)
    import org.apache.spark.sql.functions.{coalesce, lit, sum}
    // coalesce: an EMPTY index (legal — e.g. a federation shard no doc
    // routed to) writes n=0 with a NULL sumdl (sum over zero rows)
    // explicit schema: footer inference is a Spark job per read
    val row = spark.read.schema("n BIGINT, sumdl BIGINT").parquet(s"$dir/$statsRel")
      .agg(coalesce(sum("n"), lit(0L)), coalesce(sum("sumdl"), lit(0L))).head()
    val v = (row.getLong(0), row.getLong(1))
    if (statsCache.size >= ManifestCacheMax) statsCache.clear()
    if (java.util.Objects.equals(dirGen.get(dir), gen)) statsCache.put(key, v)
    v
  }

  /** Per-process cache of term DOCUMENT FREQUENCIES, keyed by
    * (dir, vocab rel path) — immutable like the stats dirs. Serving
    * queries look up a handful of probe terms each; concurrent clients
    * repeat terms (and whole probes) constantly, so the cache turns the
    * per-query probe-sized vocab job into a driver map hit, and a MISS
    * reads ONLY the unseen terms (pushed `tok IN (...)` scan — still
    * probe-sized, never the vocabulary). Absent-from-vocab terms are
    * cached as ABSENT (the sentinel) so unknown-term probes don't
    * re-scan forever. Bounded on BOTH axes: per rel (clear-on-overflow)
    * so query diversity cannot pin vocabulary-sized driver memory, and
    * on the NUMBER of rels (clear-on-overflow like the manifest cache)
    * — every index mutation writes a fresh vocab rel, so a long-running
    * CDC stream would otherwise accumulate one dead inner map per
    * superseded version forever.
    */
  private val TermDfCacheMax = 1 << 16
  private val TermDfRelsMax = 64
  private val AbsentDf = java.lang.Long.valueOf(-1L)
  private val termDfCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String), java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]]()

  /** dfs of `toks` present in the vocab sidecar (absent toks omitted). */
  def cachedTermDfs(spark: SparkSession, dir: String, vocabRel: String,
      toks: Seq[String]): Map[String, Long] = {
    val gen = dirGen.get(dir)
    if (termDfCache.size >= TermDfRelsMax &&
        !termDfCache.containsKey((dir, vocabRel)))
      termDfCache.clear()
    val m = termDfCache.computeIfAbsent((dir, vocabRel),
      _ => new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]())
    val distinct = toks.distinct
    // one value snapshot up front — a concurrent clear-on-overflow
    // between a containsKey and a get could otherwise drop a term that
    // IS in the vocab from the result
    val snapshot = distinct.flatMap(t => Option(m.get(t)).map(t -> _)).toMap
    val misses = distinct.filterNot(snapshot.contains)
    val read = if (misses.isEmpty) Map.empty[String, Long] else {
      import org.apache.spark.sql.functions.col
      val r = spark.read.schema("tok STRING, df BIGINT").parquet(s"$dir/$vocabRel")
        .filter(col("tok").isin(misses: _*))
        .select("tok", "df").collect()
        .map(x => x.getString(0) -> x.getLong(1)).toMap
      if (m.size + misses.size > TermDfCacheMax) m.clear()
      if (java.util.Objects.equals(dirGen.get(dir), gen))
        misses.foreach(t =>
          m.put(t, r.get(t).map(java.lang.Long.valueOf).getOrElse(AbsentDf)))
      r
    }
    snapshot.collect { case (t, v) if v != AbsentDf => t -> v.longValue() } ++ read
  }

  def freshRel(kind: String): String =
    s"$kind/${java.util.UUID.randomUUID().toString.replace("-", "")}"

  /** Copy dir-relative trees (files or directories) from one index
    * root to another, preserving relative paths — the promote/export
    * primitive (build cluster → serving cluster). File-level parallel
    * over a bounded pool; refuses to overwrite (the destination must
    * be virgin — export is a first commit, not a sync). At real scale
    * the same rel-list feeds distcp; the layout contract (immutable
    * files, relative manifest paths) is what makes either transport
    * correct.
    */
  def copyTree(spark: SparkSession, srcDir: String, destDir: String,
      rels: Seq[String]): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val sfs = fs(spark, srcDir)
    val dfs = fs(spark, destDir)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val copied = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val tasks = rels.distinct.map { rel =>
        pool.submit(new Runnable {
          override def run(): Unit = try {
            val s = new org.apache.hadoop.fs.Path(s"$srcDir/$rel")
            val d = new org.apache.hadoop.fs.Path(s"$destDir/$rel")
            require(sfs.exists(s), s"export: source path missing: $s")
            require(!dfs.exists(d), s"export: destination already has $d")
            val parent = d.getParent
            if (parent != null) dfs.mkdirs(parent)
            if (!org.apache.hadoop.fs.FileUtil.copy(sfs, s, dfs, d,
                false /* deleteSource */, conf))
              throw new java.io.IOException(s"export: copy failed for $rel")
            copied.add(rel)
          } catch { case t: Throwable => failures.add(t) }
        })
      }
      tasks.foreach(_.get())
      if (!failures.isEmpty) {
        // leave the destination VIRGIN for a clean retry: sweep what
        // this attempt copied (no manifest referenced it yet), then
        // throw the first failure with the rest attached
        copied.forEach(rel =>
          try { dfs.delete(new org.apache.hadoop.fs.Path(s"$destDir/$rel"), true); () }
          catch { case _: java.io.IOException => () })
        val head = failures.poll()
        failures.forEach(t => head.addSuppressed(t))
        throw head
      }
    } finally pool.shutdown()
  }

  /** Sum of the on-disk lengths of `relPaths` (dir-relative files). */
  def fileBytes(spark: SparkSession, dir: String, relPaths: Seq[String]): Long = {
    val f = fs(spark, dir)
    relPaths.map { p =>
      try f.getFileStatus(new org.apache.hadoop.fs.Path(s"$dir/$p")).getLen
      catch { case _: java.io.FileNotFoundException => 0L }
    }.sum
  }

  /** Per-stream exactly-once stamps (namespace → highest applied batch
    * id) as a JSON object; absent in pre-stamp manifests, which parse
    * as empty.
    */
  def streamsToJson(streams: Map[String, Long]): org.json4s.JValue =
    org.json4s.JObject(streams.toList.sortBy(_._1).map { case (ns, b) =>
      ns -> (org.json4s.JLong(b): org.json4s.JValue) })

  def streamsFromJson(j: org.json4s.JValue): Map[String, Long] = j match {
    case org.json4s.JObject(fields) =>
      implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
      fields.map { case (ns, v) => ns -> v.extract[Long] }.toMap
    case _ => Map.empty
  }

  /** Resolve each key's LATEST metadata row across the append-ordered
    * sidecar dirs (manifest append order = dir index, so a CDC-updated
    * doc's newest metadata wins). One dir short-circuits to a plain
    * read — the shape [[InvertedIndex.compact]]/[[AnnIndex.compact]]
    * maintain: they fold the accumulated dirs into one, so a filtered
    * query's sidecar cost stays doc-count-sized regardless of how many
    * delta/CDC batches the index absorbed.
    */
  def latestMeta(spark: SparkSession, dir: String, metaDirs: Seq[String],
      keyCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(metaDirs.nonEmpty, "latestMeta needs at least one sidecar dir")
    if (metaDirs.size == 1) spark.read.parquet(s"$dir/${metaDirs.head}")
    else {
      val all = metaDirs.zipWithIndex.map { case (d, i) =>
        spark.read.parquet(s"$dir/$d").withColumn("__seq", lit(i))
      }.reduce(_ unionByName _)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(keyCol)).orderBy(col("__seq").desc)
      all.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn", "__seq")
    }
  }

  /** List the staged parquet files under `dir/rel` as (partition value,
    * dir-relative path) pairs, where the partition value is parsed from
    * the `prefix=<v>` directory level (partitionBy layout).
    */
  def listStaged(spark: SparkSession, dir: String, rel: String,
      prefix: String): Seq[(Int, String)] = {
    val f = fs(spark, dir)
    val it = f.listFiles(new org.apache.hadoop.fs.Path(s"$dir/$rel"), true)
    val out = Seq.newBuilder[(Int, String)]
    val root = new org.apache.hadoop.fs.Path(dir).toUri.getPath.stripSuffix("/")
    while (it.hasNext) {
      val p = it.next().getPath
      if (p.getName.endsWith(".parquet")) {
        val relPath = p.toUri.getPath.stripPrefix(root + "/")
        val v = relPath.split('/').collectFirst {
          case s if s.startsWith(prefix + "=") => s.stripPrefix(prefix + "=").toInt
        }.getOrElse(sys.error(s"staged file outside a $prefix= dir: $relPath"))
        out += v -> relPath
      }
    }
    out.result()
  }
}
