package graft.operators

import graft.functions.VectorFunctions._
import graft.plans.VectorQuantization
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Persisted IVF serving index — the dense-side twin of
  * [[InvertedIndex]] (`search_bm25_indexed`): [[Similarity.ivfTopK]]
  * re-trains the quantizer and re-assigns every candidate on every
  * query, which is the correct recall BASELINE but not a serving shape.
  * Here the corpus is assigned once to its coarse cell and persisted
  * one file-set per cell; a probe reads ONLY its nProbe cells' files —
  * pruned from the manifest's metadata before the scan is planned —
  * and the exact cosine runs on that slice alone. At 100 TB a query
  * touches ~nProbe/nCells of the index, never the corpus.
  *
  *  - '''build''': train the coarse quantizer on a bounded
  *    deterministic sample ([[Similarity.trainQuantizer]]'s
  *    contract), assign each vector to its nearest centroid (one
  *    scan, the codegen'd CentroidCells expression — no join), stage
  *    the vectors cell-partitioned, commit manifest v1 with the
  *    CENTROIDS INLINE (nCells × dim doubles, bit-exact as IEEE longs
  *    — they are the index metadata every later operation derives
  *    from).
  *  - '''addDelta''' (churn-sized): assign the delta against the
  *    PERSISTED centroids — a pure per-row function, so
  *    `lists(old) ∪ assign(delta)` is exactly `lists(old ∪ delta)`
  *    (the [[Similarity.ivfAssignDelta]] identity) — stage, commit.
  *    Historical cell files are never read.
  *  - '''topK''': probes map to their nProbe nearest cells (a
  *    ≤ nCells driver-side collect), the manifest's file list is
  *    pruned to those cells, and the exact cosine + per-probe window
  *    ranks the slice. Same output shape as `ann_ivf`.
  *  - '''compact''' / '''vacuum''': fold per-delta small files per
  *    cell / expire old manifests and sweep unreferenced files — the
  *    same maintenance actions as the lexical index, via the shared
  *    [[IndexManifests]] commit protocol (atomic exclusive-create
  *    claim; a crash before the claim leaves only invisible orphans;
  *    racing maintainers serialize and retry).
  *
  * Recall is the ann_ivf bound (≥ 0.8 vs brute force, spec-pinned):
  * identical centroid training, assignment, and probe-cell selection —
  * the persisted layout changes WHERE the lists live, not what they
  * contain. When centroid drift degrades recall, rebuild retrains;
  * [[graft.operators.Drift]]'s canary decides when.
  */
object AnnIndex {

  val DefaultCells = 16

  /** One committed index version: the coarse centroids (bit-exact) and
    * the exact vector files with their cell. Paths relative to root.
    * `streams` carries per-stream exactly-once batch stamps committed
    * in the same atomic manifest claim as the content (the lexical
    * index's contract — see [[InvertedIndex.Manifest]]).
    */
  final case class Manifest(
      version: Long,
      centroids: Array[Array[Double]],
      vectors: Seq[(Int, String)],
      streams: Map[String, Long] = Map.empty,
      /** vector-metadata sidecar for FILTERED ANN (the lexical index's
        * [[InvertedIndex.Manifest]] contract): columns pinned at
        * build, dirs append-ordered so CDC-updated metadata wins;
        * a `where` query against a sidecar-free index fails loudly.
        */
      metaCols: Seq[String] = Nil,
      metaDirs: Seq[String] = Nil,
      /** vector-id tombstones ([[deleteVecs]]/[[applyCdc]]) as
        * (dir, cover): each excludes ids ONLY from the first `cover`
        * vector files — Iceberg equality-delete sequence semantics
        * (see [[InvertedIndex.Manifest]]), so one atomic commit can
        * tombstone an id's old vector and append its new one. No stat
        * corrections needed on the dense side — cosine ranking has no
        * corpus-level terms (centroid drift is the rebuild canary's
        * concern, not the tombstone's).
        */
      deletes: Seq[(String, Int)] = Nil,
      /** per-subspace PQ residual codebooks (m × nCodes × dim/m,
        * bit-exact IEEE longs like the centroids) — present iff the
        * index was built with `pq = Some(...)`. Rows then carry an
        * m-code `codes` column next to the raw vector: the ADC serve
        * path ([[pqTopK]]) scans ONLY (neighbor_id, codes, __cell) of
        * the probed cells (parquet column pruning delivers the byte
        * cut — m ints vs dim doubles per candidate) and touches raw
        * vectors just for the shortlist's exact re-rank. Deltas encode
        * against THESE persisted codebooks — encoding is a pure
        * per-row function of (vector, centroids, codebooks), so
        * delta ∪ old ≡ full re-encode (the ann_ivfpq_delta identity).
        */
      codebooks: Array[Array[Array[Double]]] = Array.empty)

  private def toJson(m: Manifest): String = {
    // doubles as raw IEEE-754 bits: JSON decimal printing is not
    // guaranteed to round-trip, and the centroids must be BIT-exact —
    // assignment with perturbed centroids silently moves cell borders
    val root = JObject(List(
      "version" -> JLong(m.version),
      "centroids" -> JArray(m.centroids.map(c =>
        JArray(c.map(d => JLong(java.lang.Double.doubleToRawLongBits(d)): JValue).toList)).toList),
      "streams" -> IndexManifests.streamsToJson(m.streams),
      "metaCols" -> JArray(m.metaCols.map(JString(_): JValue).toList),
      "metaDirs" -> JArray(m.metaDirs.map(JString(_): JValue).toList),
      "deletes" -> JArray(m.deletes.map { case (p, c) =>
        JObject(List("path" -> JString(p), "cover" -> JInt(c))): JValue
      }.toList),
      "codebooks" -> JArray(m.codebooks.map(cb =>
        JArray(cb.map(c =>
          JArray(c.map(d =>
            JLong(java.lang.Double.doubleToRawLongBits(d)): JValue).toList): JValue).toList): JValue).toList),
      "vectors" -> JArray(m.vectors.map { case (cell, p) =>
        JObject(List("cell" -> JInt(cell), "path" -> JString(p)))
      }.toList)))
    JsonMethods.pretty(JsonMethods.render(root))
  }

  private def fromJson(body: String): Manifest = {
    val j = JsonMethods.parse(body)
    implicit val fmts: Formats = DefaultFormats
    Manifest(
      version = (j \ "version").extract[Long],
      centroids = (j \ "centroids").extract[List[List[Long]]]
        .map(_.map(java.lang.Double.longBitsToDouble).toArray).toArray,
      vectors = (j \ "vectors").extract[List[JValue]].map(e =>
        ((e \ "cell").extract[Int], (e \ "path").extract[String])),
      streams = IndexManifests.streamsFromJson(j \ "streams"),
      metaCols = j \ "metaCols" match {
        case JArray(xs) => xs.collect { case JString(s) => s }
        case _ => Nil
      },
      metaDirs = j \ "metaDirs" match {
        case JArray(xs) => xs.collect { case JString(s) => s }
        case _ => Nil
      },
      deletes = j \ "deletes" match {
        case JArray(items) => items.collect {
          case JString(s) => (s, Int.MaxValue) // legacy: covered everything
          case o: JObject => ((o \ "path").extract[String], (o \ "cover").extract[Int])
        }
        case _ => Nil
      },
      codebooks = j \ "codebooks" match {
        case JArray(cbs) => cbs.map(cb =>
          cb.extract[List[List[Long]]]
            .map(_.map(java.lang.Double.longBitsToDouble).toArray).toArray).toArray
        case _ => Array.empty
      })
  }

  private[graft] def versions(spark: SparkSession, dir: String): Seq[Long] =
    IndexManifests.versions(spark, dir)

  private[graft] def currentManifest(spark: SparkSession, dir: String): Manifest = {
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no committed ANN index at $dir")
    IndexManifests.cachedManifest(spark, dir, vs.last)(fromJson)
  }

  /** Manifest at a PINNED version — the federation's transition-MVCC
    * read ([[ShardedIndex]] layout pins; the version must not have been
    * vacuumed: keepVersions >= 2 during a transition).
    */
  private[graft] def readManifest(spark: SparkSession, dir: String, v: Long): Manifest =
    IndexManifests.cachedManifest(spark, dir, v)(fromJson)

  /** Target bytes per staged vector file. One file per cell does NOT
    * scale — `repartition(nCells, cell)` makes a single task write a
    * cell's ENTIRE data (at 100 TB, terabytes through one writer), and
    * serve parallelism collapses to nProbe tasks. Splitting by
    * (cell, id) hash keeps the layout contract (each file belongs to
    * one cell) while bounding both writer task size and reader
    * task granularity.
    */
  val TargetFileBytes: Long = 64L << 20
  val MaxSplits = 4096

  private[graft] def stageSplits(assigned: DataFrame, nCells: Int): Int = {
    val bytes = graft.operators.ScaleSafe.leafScanBytes(assigned)
    // bytes-derived only, no nCells floor — see InvertedIndex
    // .stagePostings: a task floor multiplies every churn-sized delta
    // into ~floor × cells small files; the writer cliff is covered by
    // the bytes term and readers split large parquet files by row group
    (bytes / TargetFileBytes).max(1).min(MaxSplits).toInt
  }

  private def stageVectors(spark: SparkSession, assigned: DataFrame,
      dir: String, nCells: Int, splits: Option[Int] = None): Seq[(Int, String)] = {
    val rel = IndexManifests.freshRel("vectors")
    // the cell rides in the rows too (partitionBy strips its column
    // from file contents, and manifest-pruned reads open leaf files
    // directly, losing the dir value) — serving then never re-runs the
    // nCells × dim assignment per sliced row
    assigned.withColumn("__cell", col("cell"))
      .repartition(splits.getOrElse(stageSplits(assigned, nCells)),
        col("cell"), col("neighbor_id"))
      .write.mode("errorifexists").partitionBy("cell").parquet(s"$dir/$rel")
    IndexManifests.listStaged(spark, dir, rel, "cell")
  }

  // written schemas, declared explicitly on read: footer inference is
  // a Spark job per read.parquet call (see InvertedIndex.readPostings)
  private val VectorSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "neighbor_id BIGINT, __cv ARRAY<DOUBLE>, __cell INT")
  private val VectorSchemaCoded = org.apache.spark.sql.types.StructType.fromDDL(
    "neighbor_id BIGINT, __cv ARRAY<DOUBLE>, codes ARRAY<INT>, __cell INT")
  private val AnnTombstoneSchema =
    org.apache.spark.sql.types.StructType.fromDDL("neighbor_id BIGINT")

  private def readVectors(spark: SparkSession, dir: String,
      files: Seq[(Int, String)], withCodes: Boolean = false): DataFrame = {
    val schema = if (withCodes) VectorSchemaCoded else VectorSchema
    if (files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema)
      .parquet(files.map { case (_, p) => s"$dir/$p" }: _*)
  }

  private def assign(emb: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]]): DataFrame =
    emb.select(col(idCol).cast("long").as("neighbor_id"),
        asDouble(col(vecCol)).as("__cv"))
      .withColumn("cell",
        element_at(VectorQuantization.centroidCells(col("__cv"), centroids, 1), 1))

  // cosine contract across the PQ family (Similarity's convention):
  // residuals and ADC run on UNIT vectors — dot on raw vectors would
  // rank large-norm candidates above nearer ones
  private def unitCol(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val n = sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x))
    transform(v, x => x / greatest(n, lit(1e-12)))
  }

  /** Append the m-code PQ `codes` column to an assigned frame: residual
    * of the UNIT vector against its cell centroid, each subspace coded
    * against its persisted L2 codebook. Pure per-row — the property
    * that makes delta encoding ≡ full re-encode.
    */
  private def withCodes(assigned: DataFrame, centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val m = codebooks.length
    val dim = centroids.head.length
    val sub = dim / m
    val centLit = typedLit(centroids.map(_.toSeq).toSeq)
    val resid = zip_with(unitCol(col("__cv")), element_at(centLit, col("cell") + 1),
      (a, b) => a - b)
    val codeCols = (0 until m).map { j =>
      element_at(VectorQuantization.centroidCellsL2(
        slice(col("__resid"), j * sub + 1, sub), codebooks(j), 1), 1)
    }
    assigned.withColumn("__resid", resid)
      .withColumn("codes", array(codeCols: _*))
      .drop("__resid")
  }

  /** Train the per-subspace residual codebooks on the SAME bounded
    * deterministic sample contract as the coarse quantizer, against
    * the coarse centroids the index will persist (residuals must be
    * relative to the cells the vectors are actually stored under).
    */
  private def trainCodebooks(emb: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], m: Int, nCodes: Int,
      sampleSize: Int, iters: Int): Array[Array[Array[Double]]] = {
    val sample = emb
      .select(col(idCol).cast("long").as("__id"), asDouble(col(vecCol)).as("__v"))
      .orderBy("__id").limit(sampleSize)
      .select("__v").collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "PQ build needs a non-empty corpus")
    val dim = sample.head.length
    require(dim % m == 0, s"vector dim $dim must be divisible by m=$m")
    val sub = dim / m
    val residuals = sample.map { raw =>
      var s = 0.0; var i = 0
      while (i < dim) { s += raw(i) * raw(i); i += 1 }
      val norm = math.max(math.sqrt(s), 1e-12)
      val v = raw.map(_ / norm)
      var best = 0; var bestDot = Double.MinValue
      var ci = 0
      while (ci < centroids.length) {
        var d = 0.0; i = 0
        while (i < dim) { d += v(i) * centroids(ci)(i); i += 1 }
        if (d > bestDot) { bestDot = d; best = ci }
        ci += 1
      }
      Array.tabulate(dim)(i => v(i) - centroids(best)(i))
    }
    Array.tabulate(m) { j =>
      VectorQuantization.trainCentroidsL2(
        residuals.map(_.slice(j * sub, (j + 1) * sub)), nCodes, iters, seed = 42L + j)
    }
  }

  /** Build from scratch: one assignment scan + a cell-clustered write.
    * Centroid training matches [[Similarity.ivfTopK]] exactly
    * (deterministic ordered sample, fixed seed), so recall carries over.
    */
  /** PQ spec for a code-carrying build: m subspaces × nCodes codewords
    * per subspace (dim must divide by m).
    */
  final case class PqSpec(m: Int = 8, nCodes: Int = 16)

  def build(emb: DataFrame, idCol: String, vecCol: String, dir: String,
      nCells: Int = DefaultCells, sampleSize: Int = 2048, iters: Int = 5,
      splits: Option[Int] = None, metaCols: Seq[String] = Nil,
      pq: Option[PqSpec] = None): Unit = {
    val spark = emb.sparkSession
    require(versions(spark, dir).isEmpty,
      s"ANN index already committed at $dir (addDelta grows it; build starts fresh)")
    val centroids = Similarity.trainQuantizer(emb, idCol, vecCol, nCells, sampleSize, iters)
    val codebooks = pq.fold(Array.empty[Array[Array[Double]]])(spec =>
      trainCodebooks(emb, idCol, vecCol, centroids, spec.m, spec.nCodes, sampleSize, iters))
    val assigned0 = assign(emb, idCol, vecCol, centroids)
    val assigned = if (codebooks.isEmpty) assigned0
      else withCodes(assigned0, centroids, codebooks)
    val files = stageVectors(spark, assigned, dir, centroids.length, splits)
    val metaDirs = stageMeta(emb, idCol, metaCols, dir).toSeq
    // a rebuild at a previously-used path must not serve the old tree's
    // cached manifests
    IndexManifests.invalidate(dir)
    require(IndexManifests.tryCommit(spark, dir, 1L,
      toJson(Manifest(1L, centroids, files, metaCols = metaCols, metaDirs = metaDirs,
        codebooks = codebooks))),
      s"lost the build commit race at $dir — another maintainer built concurrently")
  }

  /** Stage a (neighbor_id, metaCols…) sidecar batch; None when the
    * index carries no metadata (see [[InvertedIndex]]'s sidecar).
    */
  private def stageMeta(emb: DataFrame, idCol: String, metaCols: Seq[String],
      dir: String): Option[String] =
    if (metaCols.isEmpty) None
    else {
      val rel = IndexManifests.freshRel("meta")
      val meta = emb.select(
        (col(idCol).cast("long").as("neighbor_id") +: metaCols.map(col)): _*)
      // one metadata row per vector per batch (loud, like the lexical
      // sidecar): latest-wins is ordered across batches, and a
      // within-batch tie would resolve nondeterministically
      val dup = meta.groupBy(col("neighbor_id")).agg(count(lit(1)).as("__c"))
        .filter(col("__c") > 1).limit(1).collect()
      require(dup.isEmpty,
        s"duplicate neighbor_id ${if (dup.nonEmpty) dup.head.getLong(0) else ""} in the " +
          "metadata sidecar batch — supply one metadata row per vector per batch")
      meta.write.mode("errorifexists").parquet(s"$dir/$rel")
      Some(rel)
    }

  /** Fold NEW vectors (ids disjoint from the indexed set) in against
    * the persisted centroids: churn-sized, shuffle-free assignment,
    * historical cell files never read, visible atomically at the
    * manifest claim. Losing a race to a concurrent maintainer retries
    * against the fresh manifest (staged files are reusable as-is).
    */
  def addDelta(delta: DataFrame, idCol: String, vecCol: String, dir: String,
      maxAttempts: Int = 5, stamp: Option[(String, Long)] = None): Unit = {
    val spark = delta.sparkSession
    val base0 = currentManifest(spark, dir)
    stamp.foreach { case (ns, batchId) =>
      if (base0.streams.get(ns).exists(_ >= batchId)) return
    }
    val assigned0 = assign(delta, idCol, vecCol, base0.centroids)
    val assigned = if (base0.codebooks.isEmpty) assigned0
      else withCodes(assigned0, base0.centroids, base0.codebooks)
    val files = stageVectors(spark, assigned, dir, base0.centroids.length)
    val metaRel = stageMeta(delta, idCol, base0.metaCols, dir)
    var attempt = 0
    while (attempt < maxAttempts) {
      attempt += 1
      val base = currentManifest(spark, dir)
      stamp.foreach { case (ns, batchId) =>
        // a replay that raced past the pre-check: the stamp is already
        // committed, the staged files become orphans for vacuum
        if (base.streams.get(ns).exists(_ >= batchId)) return
      }
      val next = Manifest(base.version + 1, base.centroids, base.vectors ++ files,
        base.streams ++ stamp.toMap, base.metaCols, base.metaDirs ++ metaRel,
        base.deletes, base.codebooks)
      if (IndexManifests.tryCommit(spark, dir, next.version, toJson(next))) return
    }
    throw new graft.catalog.GraftCommitConflict(
      s"ANN index delta lost the version race $maxAttempts times at $dir")
  }

  /** Highest batch id committed under stream namespace `ns`, if any. */
  def committedBatchId(spark: SparkSession, dir: String, ns: String): Option[Long] =
    currentManifest(spark, dir).streams.get(ns)

  /** LIVE rows of `selected` vector files under `m`'s tombstones — the
    * coverage-aware exclusion shared with the lexical index (see
    * [[InvertedIndex.liveRows]]); a plain read when no tombstones.
    */
  private[graft] def liveRows(spark: SparkSession, dir: String, m: Manifest,
      selected: Seq[(Int, String)]): DataFrame = {
    val base = readVectors(spark, dir, selected, withCodes = m.codebooks.nonEmpty)
    if (m.deletes.isEmpty) return base
    // last THREE path components as the key — leaf names collide across
    // a partitionBy job's cell dirs (see InvertedIndex.liveRows)
    val posRows = m.vectors.map(_._2).zipWithIndex.map { case (p, i) =>
      org.apache.spark.sql.Row(p.split('/').takeRight(3).mkString("/"), i)
    }
    // LocalRelation (List overload), NOT parallelize — the broadcast of
    // an RDD-backed frame costs a job per serve (see InvertedIndex)
    val posDf = spark.createDataFrame(
      java.util.Arrays.asList(posRows: _*),
      org.apache.spark.sql.types.StructType.fromDDL("__fn STRING, __fidx INT"))
    val tomb = m.deletes.map { case (d, c) =>
      spark.read.schema(AnnTombstoneSchema).parquet(s"$dir/$d")
        .select(col("neighbor_id"), lit(c).as("__cover"))
    }.reduce(_ unionByName _)
    val tagged = base
      .withColumn("__fn",
        concat_ws("/", slice(split(input_file_name(), "/"), -3, 3)))
      .join(broadcast(posDf), Seq("__fn"))
    tagged
      .join(tomb, tagged("neighbor_id") === tomb("neighbor_id") &&
        tagged("__fidx") < tomb("__cover"), "left_anti")
      .drop("__fn", "__fidx")
  }

  /** Delete vectors from the index: one atomic tombstone commit (no
    * index scan needed — the dense side has no corpus-level stats to
    * correct). Tombstoned ids are excluded from every [[topK]] until
    * [[compact]] drops their rows; an id re-inserted after a deletion
    * is live again (coverage semantics) and deletable again. Deleting
    * ids already dead under a full-coverage tombstone is a no-op.
    */
  def deleteVecs(ids: DataFrame, idCol: String, dir: String,
      maxAttempts: Int = 5): Unit = {
    val spark = ids.sparkSession
    val del = ids.select(col(idCol).cast("long").as("neighbor_id")).distinct()
    var attempt = 0
    while (attempt < maxAttempts) {
      attempt += 1
      val base = currentManifest(spark, dir)
      // certainly-dead ids: tombstoned with cover == current file count
      // (no delta appended since, so no resurrection possible)
      val full = base.deletes.filter(_._2 >= base.vectors.size).map(_._1)
      val fresh =
        if (full.isEmpty) del
        else del.join(
          spark.read.schema(AnnTombstoneSchema)
            .parquet(full.map(d => s"$dir/$d"): _*),
          Seq("neighbor_id"), "left_anti")
      if (fresh.isEmpty) return
      val delRel = IndexManifests.freshRel("deletes")
      fresh.coalesce(1).write.mode("errorifexists").parquet(s"$dir/$delRel")
      val next = Manifest(base.version + 1, base.centroids, base.vectors,
        base.streams, base.metaCols, base.metaDirs,
        base.deletes :+ (delRel -> base.vectors.size), base.codebooks)
      if (IndexManifests.tryCommit(spark, dir, next.version, toJson(next))) return
    }
    throw new graft.catalog.GraftCommitConflict(
      s"ANN index delete lost the version race $maxAttempts times at $dir")
  }

  /** One ATOMIC CDC micro-batch: `upserts` = new (id, vector) versions,
    * `removalIds` = ids leaving the index (deleted ids and updated
    * ids). One manifest claim commits the new cell files, a tombstone
    * covering only the PRE-batch files (the new vectors survive it —
    * Iceberg sequence semantics), and the stream stamp. No old vectors
    * needed: the dense side has no corpus-level stats to correct.
    */
  def applyCdc(upserts: DataFrame, removalIds: DataFrame, idCol: String,
      vecCol: String, dir: String, stamp: Option[(String, Long)] = None,
      maxAttempts: Int = 5): Unit = {
    val spark = upserts.sparkSession
    val base0 = currentManifest(spark, dir)
    stamp.foreach { case (ns, batchId) =>
      if (base0.streams.get(ns).exists(_ >= batchId)) return
    }
    val files =
      if (upserts.isEmpty) Nil
      else {
        val assigned0 = assign(upserts, idCol, vecCol, base0.centroids)
        val assigned = if (base0.codebooks.isEmpty) assigned0
          else withCodes(assigned0, base0.centroids, base0.codebooks)
        stageVectors(spark, assigned, dir, base0.centroids.length)
      }
    val metaRel =
      if (upserts.isEmpty) None
      else stageMeta(upserts, idCol, base0.metaCols, dir)
    val tombstoneIds = removalIds.select(col(idCol).cast("long").as("neighbor_id")).distinct()
    val hasRemovals = !tombstoneIds.isEmpty
    var attempt = 0
    while (attempt < maxAttempts) {
      attempt += 1
      val base = currentManifest(spark, dir)
      stamp.foreach { case (ns, batchId) =>
        if (base.streams.get(ns).exists(_ >= batchId)) return
      }
      val delEntry =
        if (!hasRemovals) None
        else {
          val delRel = IndexManifests.freshRel("deletes")
          tombstoneIds.coalesce(1).write.mode("errorifexists").parquet(s"$dir/$delRel")
          Some(delRel -> base.vectors.size)
        }
      val next = Manifest(base.version + 1, base.centroids, base.vectors ++ files,
        base.streams ++ stamp.toMap, base.metaCols, base.metaDirs ++ metaRel,
        base.deletes ++ delEntry, base.codebooks)
      if (IndexManifests.tryCommit(spark, dir, next.version, toJson(next))) return
    }
    throw new graft.catalog.GraftCommitConflict(
      s"ANN CDC batch lost the version race $maxAttempts times at $dir")
  }

  /** Exact-cosine top-`k` within the probes' nProbe nearest cells,
    * answered FROM the index: the scan is planned over only those
    * cells' files. Output shape matches `ann_ivf` (probe_id,
    * neighbor_id, cosine, rank); probes are excluded from their own
    * neighbor lists when they are indexed.
    */
  def topK(probes: DataFrame, idCol: String, vecCol: String, dir: String,
      k: Int, nProbe: Int = 4, maxProbes: Int = 16384,
      where: Option[org.apache.spark.sql.Column] = None,
      excludeSelf: Boolean = true): DataFrame =
    // one bounded probe collect enforces the small-side contract AND
    // feeds the driver-side cell assignment — no separate count job
    topKRows(probes.sparkSession,
      collectProbes(probes, idCol, vecCol, maxProbes), dir, k, nProbe,
      where, excludeSelf)

  /** [[topK]] over DRIVER-collected probe rows — the serve kernel the
    * federation fans out ([[ShardedIndex.annTopKSharded]] collects the
    * probes ONCE and feeds every shard). Cell assignment runs on the
    * driver through the same [[VectorQuantization.nearestCells]]
    * arithmetic the rows were staged with (bit-identical centroids from
    * the manifest), so preparing a query launches ZERO Spark jobs: the
    * round-13 path paid one probe-cells collect job per shard per query
    * — S driver dispatches per federated query, the measured concurrency
    * ceiling at 32 clients (BENCH_SF1 addendum 7). The probe side
    * becomes a local relation; everything downstream (manifest-pruned
    * cell scan, broadcast join, window top-k) is one declarative plan.
    */
  private[graft] def topKRows(spark: SparkSession,
      probeRows: Seq[(Long, Array[Double])], dir: String,
      k: Int, nProbe: Int,
      where: Option[org.apache.spark.sql.Column],
      excludeSelf: Boolean,
      manifest: Option[Manifest] = None): DataFrame = {
    import spark.implicits._
    // an explicit manifest is the federation's transition pin — head
    // resolution stays the default for every steady-state caller
    val m = manifest.getOrElse(currentManifest(spark, dir))
    // centroid norms once per query, not per probe — a contract-max
    // probe set would otherwise rebuild them 16k times on the driver
    val norms = VectorQuantization.centroidNorms(m.centroids)
    val pLocal = probeRows.flatMap { case (pid, pv) =>
      VectorQuantization.nearestCells(pv, m.centroids, nProbe, normsPre = norms)
        .map(c => (pid, pv.toSeq, c))
    }
    val p = pLocal.toDF("probe_id", "__pv", "cell")
    // ≤ nCells distinct values by construction — driver-side set, no job
    val probeCells = pLocal.map(_._3).toSet
    // the cell was computed ONCE at stage time (same pure assignment
    // arithmetic, bit-identical centroids) and stored in the rows, so
    // each probe compares only within ITS probed cells — the exact
    // ivfTopK join semantics with no per-row re-assignment at serve
    val slice0 = liveRows(spark, dir, m, m.vectors.filter(e => probeCells(e._1)))
      .withColumn("cell", col("__cell"))
    // filtered ANN: restrict the candidate slice by the meta-sidecar
    // predicate BEFORE ranking — top-k of the allowed subset (the
    // lexical index's filtered-retrieval contract; latest metadata
    // wins under CDC, sidecar reads are vector-count-sized)
    val slice = where match {
      case None => slice0
      case Some(pred) =>
        require(m.metaCols.nonEmpty,
          s"filtered query against $dir, but the index was built without metaCols " +
            "(build(metaCols = ...) pins the sidecar)")
        val latest = IndexManifests.latestMeta(spark, dir, m.metaDirs, "neighbor_id")
        slice0.join(latest.filter(pred).select("neighbor_id"), Seq("neighbor_id"), "left_semi")
    }
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    // self-exclusion only when the probes ARE corpus vectors (the
    // "query is a document" shape); a raw query vector (the SQL TVF
    // path) must keep every neighbor — its synthetic probe id could
    // collide with a real corpus id and silently drop that vector
    val joined0 = slice.join(broadcast(p), Seq("cell"))
    val joined = if (excludeSelf) joined0.filter(col("neighbor_id") =!= col("probe_id"))
      else joined0
    joined
      .withColumn("cosine", cosine(col("__pv"), col("__cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("probe_id", "neighbor_id", "cosine", "rank")
  }

  /** ADC top-`k` FROM the persisted PQ codes — the serving shape of
    * [[Similarity.ivfPqTopK]] (FAISS IVFADC). Two stages over ONLY the
    * probed cells' files (manifest-pruned like [[topK]]):
    *
    *  1. '''shortlist''': per probe, score every candidate in its
    *     probed cells as `cdot(probe·centroid) + Σ_j table_j[code_j]`
    *     — the scan is column-pruned to (neighbor_id, codes, __cell),
    *     m ints per candidate instead of dim doubles: the byte cut
    *     that lets a 100 TB dense corpus's code columns stay
    *     page-cache-resident where raw vectors never would.
    *  2. '''re-rank''': exact cosine on the shortlist only, raw
    *     vectors fetched by an id join against the same pruned slice.
    *
    * Codes were encoded against the manifest's persisted quantizers at
    * build/delta/CDC time, so serving never re-encodes. Recall carries
    * the ann_ivfpq bound (spec-pinned); determinism follows from the
    * bit-exact manifest quantizers + deterministic tie-breaks.
    */
  def pqTopK(probes: DataFrame, idCol: String, vecCol: String, dir: String,
      k: Int, nProbe: Int = 4, shortlist: Int = 100, maxProbes: Int = 16384,
      where: Option[org.apache.spark.sql.Column] = None,
      excludeSelf: Boolean = true): DataFrame =
    pqTopKRows(probes.sparkSession, collectProbes(probes, idCol, vecCol, maxProbes),
      dir, k, nProbe, shortlist, where, excludeSelf)

  /** One bounded collect of the probe side — shared by [[pqTopK]] and
    * the federation ([[ShardedIndex.pqTopKSharded]] collects ONCE and
    * feeds every shard, instead of S identical probe jobs).
    */
  private[graft] def collectProbes(probes: DataFrame, idCol: String, vecCol: String,
      maxProbes: Int): Seq[(Long, Array[Double])] = {
    val probeRows = probes.select(col(idCol).cast("long"), asDouble(col(vecCol)))
      .limit(maxProbes + 1).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    require(probeRows.length <= maxProbes,
      s"ANN probe side exceeds the small-side contract (> $maxProbes rows); " +
        "batch large probe sets")
    probeRows.toSeq
  }

  private[graft] def pqTopKRows(spark: SparkSession,
      probeRows: Seq[(Long, Array[Double])], dir: String,
      k: Int, nProbe: Int, shortlist: Int,
      where: Option[org.apache.spark.sql.Column],
      excludeSelf: Boolean,
      manifest: Option[Manifest] = None): DataFrame = {
    val m = manifest.getOrElse(currentManifest(spark, dir))
    require(m.codebooks.nonEmpty,
      s"pqTopK against $dir, but the index carries no PQ codebooks " +
        "(build(pq = Some(PqSpec(...))) pins them)")
    val centroids = m.centroids
    val codebooks = m.codebooks
    val nSub = codebooks.length
    val dim = centroids.head.length
    val sub = dim / nSub
    // driver-side per probe: nProbe nearest cells by unit-probe·centroid
    // (the cdot constant of the ADC decomposition) + the m lookup tables
    val probeSide = probeRows.toSeq.flatMap { case (pid, pvRaw) =>
      val norm = math.max(math.sqrt(pvRaw.map(x => x * x).sum), 1e-12)
      val pv = pvRaw.map(_ / norm)
      val adcTables = (0 until nSub).map { j =>
        codebooks(j).map { cen =>
          var d = 0.0; var i = 0
          while (i < sub) { d += pv(j * sub + i) * cen(i); i += 1 }
          d
        }.toSeq
      }
      val byCell = centroids.zipWithIndex.map { case (cen, ci) =>
        var d = 0.0; var i = 0
        while (i < dim) { d += pv(i) * cen(i); i += 1 }
        (ci, d)
      }.sortBy { case (ci, d) => (-d, ci) }.take(nProbe)
      byCell.toSeq.map { case (ci, cdot) => (pid, ci, cdot, adcTables) }
    }
    import spark.implicits._
    val probeTables = probeSide.toDF("probe_id", "cell", "cdot", "tables")
    val probeCells = probeSide.map(_._2).toSet
    val slice0 = liveRows(spark, dir, m, m.vectors.filter(e => probeCells(e._1)))
    val slice = where match {
      case None => slice0
      case Some(pred) =>
        require(m.metaCols.nonEmpty,
          s"filtered query against $dir, but the index was built without metaCols " +
            "(build(metaCols = ...) pins the sidecar)")
        val latest = IndexManifests.latestMeta(spark, dir, m.metaDirs, "neighbor_id")
        slice0.join(latest.filter(pred).select("neighbor_id"), Seq("neighbor_id"), "left_semi")
    }
    // stage 1: ADC shortlist — column pruning keeps __cv out of this scan
    val adc = col("cdot") + aggregate(sequence(lit(1), lit(nSub)), lit(0.0), (acc, j) =>
      acc + element_at(element_at(col("tables"), j), element_at(col("codes"), j) + 1))
    val wAdc = Window.partitionBy(col("probe_id")).orderBy(col("adc").desc, col("neighbor_id"))
    val short0 = slice.select(col("neighbor_id"), col("codes"), col("__cell").as("cell"))
      .join(broadcast(probeTables), Seq("cell"))
    val short1 = if (excludeSelf) short0.filter(col("neighbor_id") =!= col("probe_id"))
      else short0
    val short = short1.withColumn("adc", adc)
      .withColumn("__adc_rank", row_number().over(wAdc))
      .filter(col("__adc_rank") <= shortlist)
      .select("probe_id", "neighbor_id")
    // stage 2: exact cosine re-rank — raw vectors touched for the
    // (probes × shortlist)-bounded id set only, broadcast by contract
    val pv = probeRows.toSeq.map { case (pid, v) => (pid, v.toSeq) }.toDF("probe_id", "__pv")
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    slice.select(col("neighbor_id"), col("__cv"))
      .join(broadcast(short), Seq("neighbor_id"))
      .join(broadcast(pv), Seq("probe_id"))
      .withColumn("cosine", cosine(col("__pv"), col("__cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("probe_id", "neighbor_id", "cosine", "rank")
  }

  /** Fold each cell's accumulated per-delta files into
    * TargetFileBytes-sized files; when tombstones exist every cell is a
    * victim (the physical-delete pass) and the new manifest clears
    * `deletes`. Commits a new manifest, superseded files become
    * unreferenced ([[vacuum]]). Bounded at nCells jobs over the
    * victim cells' rows.
    */
  def compact(spark: SparkSession, dir: String,
      targetFileBytes: Long = TargetFileBytes): Int =
    compactWithHook(spark, dir, () => (), targetFileBytes = targetFileBytes)

  /** Compaction body with a pre-commit seam for the race spec. A lost
    * claim retries against the fresh manifest (restaged — the prior
    * rewrites reference a superseded file set; orphans go to
    * [[vacuum]]), matching [[addDelta]]/[[applyCdc]]'s posture instead
    * of the single-shot `require` round 11 shipped: compaction racing
    * a live stream must land eventually, never kill the caller.
    */
  private[graft] def compactWithHook(spark: SparkSession, dir: String,
      onBeforeCommit: () => Unit, maxAttempts: Int = 5,
      targetFileBytes: Long = TargetFileBytes): Int = {
    var attempt = 0
    while (true) {
      attempt += 1
      val base = currentManifest(spark, dir)
      val byCell = base.vectors.groupBy(_._1)
      // per-cell byte totals, computed ONCE (shared by the victims
      // filter and the width derivation — see InvertedIndex.compact)
      val cellBytes: Map[Int, Long] = byCell.map { case (c, files) =>
        c -> IndexManifests.fileBytes(spark, dir, files.map(_._2))
      }
      val victims =
        if (base.deletes.nonEmpty) byCell
        else byCell.filter { case (c, files) =>
          // multi-file cells fold; single-file cells re-split when the
          // file exceeds the target (the lexical compact's force-merge
          // knob). Default target on a compacted index stays a no-op.
          files.size > 1 ||
            (cellBytes(c) / targetFileBytes).max(1) > files.size
        }
      // fold the vector-metadata sidecar alongside the cell files —
      // the lexical index's contract (see InvertedIndex.compact): one
      // latest-wins dir after maintenance, dead ids dropped, so
      // filtered-ANN cost never grows with CDC batch count
      val foldMeta = base.metaDirs.size > 1 ||
        (base.deletes.nonEmpty && base.metaDirs.nonEmpty)
      if (victims.isEmpty && !foldMeta) return 0
      val compacted = victims.toSeq.sortBy(_._1).map { case (cell, files) =>
        val rel = IndexManifests.freshRel("vectors")
        val width = (cellBytes(cell) / targetFileBytes).max(1).min(MaxSplits).toInt
        liveRows(spark, dir, base, files)
          .repartition(width, col("neighbor_id"))
          .write.mode("errorifexists").parquet(s"$dir/$rel/cell=$cell")
        cell -> IndexManifests.listStaged(spark, dir, rel, "cell")
      }.toMap
      val newMetaDirs =
        if (!foldMeta) base.metaDirs
        else {
          val latest = IndexManifests.latestMeta(spark, dir, base.metaDirs, "neighbor_id")
          val folded =
            if (base.deletes.isEmpty) latest
            else {
              val tombIds = base.deletes.map { case (d, _) =>
                spark.read.schema(AnnTombstoneSchema).parquet(s"$dir/$d")
              }.reduce(_ unionByName _).distinct()
              // a vector re-inserted AFTER its tombstone has a live row
              // in later files — its latest metadata must survive
              val liveTomb = liveRows(spark, dir, base, base.vectors)
                .join(broadcast(tombIds), Seq("neighbor_id"))
                .select("neighbor_id").distinct()
              val dead = tombIds.join(liveTomb, Seq("neighbor_id"), "left_anti")
              latest.join(broadcast(dead), Seq("neighbor_id"), "left_anti")
            }
          val rel = IndexManifests.freshRel("meta")
          folded.write.mode("errorifexists").parquet(s"$dir/$rel")
          Seq(rel)
        }
      if (attempt == 1) onBeforeCommit()
      val next = Manifest(base.version + 1, base.centroids,
        byCell.toSeq.flatMap { case (c, files) => compacted.getOrElse(c, files) }.toSeq.sortBy(_._2),
        base.streams, base.metaCols, newMetaDirs, deletes = Nil,
        codebooks = base.codebooks)
      if (IndexManifests.tryCommit(spark, dir, next.version, toJson(next)))
        // count the sidecar fold too: a meta-only pass still committed a
        // new version (callers gate vacuum on "did compact do work")
        return victims.valuesIterator.map(_.size).sum +
          (if (foldMeta) base.metaDirs.size else 0)
      if (attempt >= maxAttempts)
        throw new graft.catalog.GraftCommitConflict(
          s"ANN compaction lost the version race $maxAttempts times at $dir")
    }
    sys.error("unreachable")
  }

  /** Roll the ANN index back to `toVersion`'s content as a new head
    * commit — the lexical index's [[InvertedIndex.rollback]] contract:
    * vectors/centroids/tombstones/stream-stamps all rewind together,
    * history stays travelable, the target must not be vacuumed away.
    */
  def rollback(spark: SparkSession, dir: String, toVersion: Long,
      maxAttempts: Int = 5): Long = {
    require(versions(spark, dir).contains(toVersion),
      s"no manifest v$toVersion at $dir — expired by vacuum (keepVersions bounds rollback reach)")
    val target = IndexManifests.cachedManifest(spark, dir, toVersion)(fromJson)
    var attempt = 0
    while (attempt < maxAttempts) {
      attempt += 1
      val base = currentManifest(spark, dir)
      if (base.version == toVersion) return base.version
      val next = target.copy(version = base.version + 1)
      if (IndexManifests.tryCommit(spark, dir, next.version, toJson(next))) return next.version
    }
    throw new graft.catalog.GraftCommitConflict(
      s"ANN index rollback lost the version race $maxAttempts times at $dir")
  }

  /** Export/promote the CURRENT version to a virgin destination — the
    * dense twin of [[InvertedIndex.exportIndex]]: copy the head
    * manifest's vector files, meta sidecars and tombstones preserving
    * relative paths, then commit at the destination as version 1
    * through the exclusive-create claim. Centroids and PQ codebooks
    * travel INSIDE the manifest (bit-exact IEEE longs), so the
    * promoted index assigns/encodes identically; stream stamps travel
    * with the content; history does not (fresh version line).
    */
  def exportIndex(spark: SparkSession, srcDir: String, destDir: String): Long = {
    val m = currentManifest(spark, srcDir)
    require(IndexManifests.versions(spark, destDir).isEmpty,
      s"export destination $destDir already holds a committed index")
    val rels = m.vectors.map(_._2) ++ m.metaDirs ++ m.deletes.map(_._1)
    IndexManifests.copyTree(spark, srcDir, destDir, rels)
    // same-path hygiene as build(): no stale cache for (destDir, 1)
    IndexManifests.invalidate(destDir)
    val next = m.copy(version = 1L)
    require(IndexManifests.tryCommit(spark, destDir, next.version, toJson(next)),
      s"export lost the first-commit race at $destDir — another writer is active there")
    next.version
  }

  /** Expire all but the newest `keepVersions` manifests and sweep
    * unreferenced vector files (file-granular — compaction supersedes
    * individual files inside stagings whose other cells stay live).
    * `graceMs` protects a concurrent maintainer's in-flight staging.
    */
  def vacuum(spark: SparkSession, dir: String, keepVersions: Int = 2,
      graceMs: Long = 60L * 60 * 1000): Int = {
    require(keepVersions >= 1, s"keepVersions must be >= 1, got $keepVersions")
    val f = IndexManifests.fs(spark, dir)
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no committed ANN index at $dir")
    val (expire, keep) = vs.splitAt(math.max(0, vs.size - keepVersions))
    val kept = keep.map(v => IndexManifests.cachedManifest(spark, dir, v)(fromJson))
    expire.foreach(v => f.delete(IndexManifests.manifestPath(dir, v), false))
    val now = System.currentTimeMillis()
    val root = new org.apache.hadoop.fs.Path(dir).toUri.getPath.stripSuffix("/")
    val live: Set[String] = kept.flatMap(_.vectors.map(_._2)).toSet
    var removed = 0
    val vRoot = new org.apache.hadoop.fs.Path(s"$dir/vectors")
    if (f.exists(vRoot)) f.listStatus(vRoot).foreach { st =>
      val it = f.listFiles(st.getPath, true)
      val all = Seq.newBuilder[org.apache.hadoop.fs.LocatedFileStatus]
      while (it.hasNext) all += it.next()
      val files = all.result()
      def rel(p: org.apache.hadoop.fs.Path) = p.toUri.getPath.stripPrefix(root + "/")
      if (!files.exists(x => live.contains(rel(x.getPath)))) {
        if (now - st.getModificationTime >= graceMs &&
            files.forall(x => now - x.getModificationTime >= graceMs)) {
          f.delete(st.getPath, true); removed += 1
        }
      } else files.foreach { x =>
        if (x.getPath.getName.endsWith(".parquet") &&
            !live.contains(rel(x.getPath)) &&
            now - x.getModificationTime >= graceMs) {
          f.delete(x.getPath, false); removed += 1
        }
      }
    }
    val liveDel: Set[String] = kept.flatMap(_.deletes.map(_._1)).toSet
    val dRoot = new org.apache.hadoop.fs.Path(s"$dir/deletes")
    if (f.exists(dRoot)) f.listStatus(dRoot).foreach { st =>
      if (!liveDel.contains(s"deletes/${st.getPath.getName}") &&
          now - st.getModificationTime >= graceMs) {
        f.delete(st.getPath, true); removed += 1
      }
    }
    val liveMeta: Set[String] = kept.flatMap(_.metaDirs).toSet
    val mRoot = new org.apache.hadoop.fs.Path(s"$dir/meta")
    if (f.exists(mRoot)) f.listStatus(mRoot).foreach { st =>
      if (!liveMeta.contains(s"meta/${st.getPath.getName}") &&
          now - st.getModificationTime >= graceMs) {
        f.delete(st.getPath, true); removed += 1
      }
    }
    removed
  }
}
