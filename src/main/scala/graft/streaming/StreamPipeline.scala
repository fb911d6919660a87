package graft.streaming

import graft.operators.{FieldSelection, MergeInto, MergeKey, SchemaMigration, TargetMaintenance, Upsert}
import graft.sources.SnapshotStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** The reference pipeline as Structured Streaming: parquet blobs landing
  * in a source directory are discovered incrementally (the engine's file
  * source performs the versioned listing), field-filtered, merge-keyed,
  * deduplicated to latest-per-key within each micro-batch, and MERGE'd
  * into a parquet target via `foreachBatch` — mirroring the reference's
  * staging → merge → watermark loop
  * (/root/reference/src/main/scala/main.scala:85-133).
  *
  * Scale notes: `maxFilesPerTrigger` is the reference's throughput
  * shaping; the per-batch upsert is one hash aggregation; the MERGE anti
  * join broadcasts the (small) staged batch against the large target via
  * AQE. Checkpointing gives exactly-once file tracking — the reference's
  * watermark store.
  */
object StreamPipeline {

  /** Target column holding the source blob's version (file modification
    * time) — the reference's `createdon`.
    */
  val SourceVersionColumn = "arcane_created_on"

  final case class Config(
      sourceDir: String,
      targetDir: String,
      checkpointDir: String,
      primaryKeys: Seq[String],
      versionCols: Seq[String],
      fieldRule: FieldSelection.Rule = FieldSelection.All,
      essentialFields: Set[String] = Set.empty,
      maxFilesPerTrigger: Option[Int] = None,
      maxRowsPerFile: Int = 1_000_000,
      /** the reference's `source.buffering.enabled`
        * (stream-spec-yaml-example.yaml:101-103): buffer the whole
        * backlog into ONE micro-batch (one staged upsert + one commit)
        * instead of rate-limited per-trigger batches — fewer, larger
        * snapshots when the source bursts. Overrides maxFilesPerTrigger.
        */
      sourceBuffering: Boolean = false,
      /** persist each row's source blob version (the reference stamps
        * `createdon` from the blob's createdOn onto every target row,
        * IntegrationTests.scala:172-174) — Spark-native via the file
        * source's `_metadata.file_modification_time`, so it costs no
        * extra I/O and tracks exactly the version the listing used.
        * The column can then serve as a `versionCols` entry.
        */
      includeSourceVersion: Boolean = false,
      /** fire compact/expire/orphans/analyze every N batches (the
        * reference's `maintenanceSettings.*.batchThreshold`). */
      maintenance: Option[TargetMaintenance.Settings] = None,
      /** bound transient snapshot-commit failures (merge-client retry). */
      commitRetry: RetryPolicy = RetryPolicy.Never,
      /** persist each micro-batch's staged upsert here before the MERGE
        * (the reference's staging tables, `StagingProcessor`) and dispose
        * it after the commit (`DisposeBatchProcessor`). None = merge the
        * in-memory staged plan directly (no extra I/O).
        */
      stagingDir: Option[String] = None,
      /** commit each batch with optimistic-concurrency detection
        * ([[graft.sources.SnapshotStore.commitIf]]): the merge's base
        * version is pinned when the batch reads the target, and an
        * out-of-band writer advancing the table mid-batch (a manual
        * backfill, a second stream on the same target) fails the batch
        * with a typed conflict instead of silently reverting their
        * commit — last-writer-wins becomes fail-fast. The checkpoint
        * replays the batch on restart against a fresh base.
        */
      detectConflicts: Boolean = false
  )

  /** Per-cycle pipeline metrics — the Spark-native form of the
    * reference's DeclaredMetrics/DataDog counters: collected with the
    * Observation API on the running plan (no extra pass over the data).
    */
  final case class CycleMetrics(batches: Long, rowsStaged: Long, rowsWritten: Long, maintenanceRuns: Long = 0)

  /** Monotonic batch counter carried ACROSS change-capture cycles so the
    * maintenance threshold counts stream batches, not per-cycle batches.
    */
  final class BatchCounter { private var n = 0L; def incrementAndGet(): Long = { n += 1; n }; def get: Long = n }

  /** Run the pipeline over all currently-available blobs (the streaming
    * equivalent of one change-capture cycle; `Trigger.AvailableNow`
    * drains the backlog in rate-limited micro-batches then stops).
    * Returns the number of micro-batches processed.
    */
  def runAvailableNow(spark: SparkSession, schema: StructType, cfg: Config): Long =
    runAvailableNowWithMetrics(spark, schema, cfg).batches

  /** As `runAvailableNow`, also reporting observed row counts.
    * `publisher` receives per-cycle counters (statsd-shaped seam);
    * `batchCounter` persists the batch count across cycles so the
    * maintenance threshold fires on stream-lifetime batch numbers.
    */
  def runAvailableNowWithMetrics(
      spark: SparkSession, schema: StructType, cfg: Config,
      publisher: MetricsPublisher = MetricsPublisher.Noop,
      batchCounter: BatchCounter = new BatchCounter
  ): CycleMetrics = {
    var batches = 0L
    var rowsStaged = 0L
    var rowsWritten = 0L
    var maintenanceRuns = 0L
    val reader  = spark.readStream.schema(schema)
    val rateLimit = if (cfg.sourceBuffering) None else cfg.maxFilesPerTrigger
    val src0    = rateLimit.fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(cfg.sourceDir)
    // the blob version column must be projected AT the source (hidden
    // metadata columns are only reachable there)
    val src = if (cfg.includeSourceVersion)
      src0.withColumn(SourceVersionColumn, col("_metadata.file_modification_time"))
    else src0

    val essentials = cfg.essentialFields ++ cfg.primaryKeys ++ cfg.versionCols ++
      (if (cfg.includeSourceVersion) Set(SourceVersionColumn) else Set.empty)
    val filtered = FieldSelection(src, cfg.fieldRule, essentials)
    val keyed    = MergeKey.withMergeKey(filtered, cfg.primaryKeys)

    val q = keyed.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val stagedObs = new org.apache.spark.sql.Observation()
        val writeObs  = new org.apache.spark.sql.Observation()
        val stagedPlan = Upsert.latestByKey(batch, Seq(MergeKey.ColumnName), cfg.versionCols)
          .observe(stagedObs, count(lit(1)).as("rows"))
        // optional on-disk staging: write the staged batch, merge FROM the
        // staged table (reference StagingProcessor → MergeBatchProcessor)
        val stagedBatchDir = cfg.stagingDir.map(sd => s"$sd/batch-$batchId")
        val staged = stagedBatchDir.fold(stagedPlan) { dir =>
          graft.operators.Staging.writeStaged(stagedPlan, dir, cfg.maxRowsPerFile)
          // explicit schema: an empty micro-batch stages a directory with
          // zero part files, which schema inference cannot read back
          spark.read.schema(stagedPlan.schema).parquet(dir)
        }
        val store  = new SnapshotStore(spark, cfg.targetDir)
        // pin the merge's base version HERE so conflict detection
        // compares against exactly the snapshot this merge read
        val baseVersion = store.currentVersion()
        // in-stream schema evolution (the reference's
        // SchemaMigrationProcessor): align target and batch to the union
        // schema before the MERGE — a no-op projection when schemas
        // already agree, null-fill + type-widening when the source
        // evolved, so the target follows the source across cycles
        val merged = baseVersion.map(store.readVersion).fold(staged) { t =>
          val (tAligned, sAligned) = SchemaMigration.alignPair(t, staged)
          MergeInto.merge(tAligned, sAligned, Seq(MergeKey.ColumnName))
        }.observe(writeObs, count(lit(1)).as("rows"))
        // snapshot commit: writes a fresh immutable data dir + manifest,
        // so the merge plan's scan of the previous snapshot never races
        // its own rewrite, and readers keep snapshot isolation
        if (cfg.detectConflicts)
          store.commitIf(merged, baseVersion,
            maxRowsPerFile = Some(cfg.maxRowsPerFile), retry = cfg.commitRetry)
        else
          store.commit(merged, maxRowsPerFile = Some(cfg.maxRowsPerFile), retry = cfg.commitRetry)
        // the staged batch is merged and committed: dispose it (the
        // reference's DisposeBatchProcessor runs after each merge cycle)
        stagedBatchDir.foreach(graft.operators.Staging.dispose(spark, _))
        batches += 1
        rowsStaged += stagedObs.get("rows").asInstanceOf[Long]
        rowsWritten += writeObs.get("rows").asInstanceOf[Long]
        // threshold-driven maintenance on the stream-lifetime batch number
        val n = batchCounter.incrementAndGet()
        cfg.maintenance.flatMap(s => TargetMaintenance.maybeRun(spark, store, s, n)).foreach { r =>
          maintenanceRuns += 1
          publisher.counter("graft.maintenance.runs", 1, Map("at_batch" -> r.atBatch.toString))
        }
      }
      .start()
    q.awaitTermination()
    val m = CycleMetrics(batches, rowsStaged, rowsWritten, maintenanceRuns)
    publisher.counter("graft.stream.batches", m.batches)
    publisher.counter("graft.stream.rows_staged", m.rowsStaged)
    publisher.gauge("graft.stream.rows_written", m.rowsWritten.toDouble)
    m
  }

  /** Continuous change-capture: repeated AvailableNow cycles separated by
    * jittered delays — exactly the reference's poll loop
    * (`changeCaptureInterval` + jitter). Each cycle drains newly-landed
    * blobs (checkpoint dedupes files across cycles) and commits one or
    * more snapshots. Runs `maxCycles` cycles (a production deployment
    * passes Int.MaxValue and stops via its lifetime service).
    */
  def runContinuously(
      spark: SparkSession,
      schema: StructType,
      cfg: Config,
      cadence: ChangeCapture,
      maxCycles: Int,
      lifetime: StreamLifetime = StreamLifetime.always,
      publisher: MetricsPublisher = MetricsPublisher.Noop
  ): CycleMetrics = {
    var total = CycleMetrics(0, 0, 0)
    var cycle = 0
    val batchCounter = new BatchCounter // maintenance threshold spans cycles
    while (cycle < maxCycles && lifetime.isActive) {
      val m = runAvailableNowWithMetrics(spark, schema, cfg, publisher, batchCounter)
      // rowsWritten is a gauge (target size at last commit): keep the
      // previous value through cycles that found nothing new
      val written = if (m.batches > 0) m.rowsWritten else total.rowsWritten
      total = CycleMetrics(total.batches + m.batches, total.rowsStaged + m.rowsStaged, written,
        total.maintenanceRuns + m.maintenanceRuns)
      cycle += 1
      // interruptible: a SIGTERM (lifetime.stop()) during the poll delay
      // exits promptly instead of sleeping through it
      if (cycle < maxCycles && lifetime.isActive) lifetime.interruptibleSleep(cadence.nextDelayMs())
    }
    total
  }

  /** Stream-stream inner join bounded by event time: with watermarks on
    * both sides and a time-range join condition, the engine evicts each
    * side's state once the watermark passes the interval, so join-state
    * memory is governed by the lateness bound + interval width — never
    * by stream length. The streaming form of the as-of/enrichment joins
    * the batch layer provides.
    */
  def intervalJoin(
      left: DataFrame, right: DataFrame,
      leftTsCol: String, rightTsCol: String,
      delay: String, condition: org.apache.spark.sql.Column
  ): DataFrame =
    left.withWatermark(leftTsCol, delay)
      .join(right.withWatermark(rightTsCol, delay), condition)

  /** Append-mode windowed aggregation with an event-time watermark: each
    * tumbling window emits EXACTLY ONCE, when the watermark passes its
    * end, and rows arriving later than `delay` past the watermark are
    * dropped — bounded state at any stream length (state per open window
    * only). This is the production streaming-aggregation shape; the
    * complete-mode variant below exists for the bounded oracle check.
    * Returns the streaming plan; callers attach their sink.
    */
  def windowedAggregateAppend(
      src: DataFrame, tsCol: String, windowDuration: String, delay: String,
      aggs: Seq[org.apache.spark.sql.Column]
  ): DataFrame =
    src.withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), windowDuration).as("w"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("bucket", col("w.start"))
      .drop("w")

  /** Streaming windowed aggregation (hourly counts per event type) over a
    * bounded source, complete-mode memory sink — used by the
    * `stream_pipeline` correctness query so the Structured Streaming
    * engine itself is under the oracle gate.
    */
  /** `sourceDir` must be a directory (file-source requirement); `glob`
    * selects the blobs within it.
    */
  def windowedCounts(spark: SparkSession, schema: StructType, sourceDir: String, glob: String, sinkName: String): DataFrame = {
    val src = graft.Tables.normalizeEventsTs(
      spark.readStream.schema(schema).option("pathGlobFilter", glob).parquet(sourceDir))
    val agg = src
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("bucket"), col("event_type"), col("n"), col("sum_value"))
    val q = agg.writeStream
      .format("memory")
      .queryName(sinkName)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(sinkName).orderBy("bucket", "event_type")
  }
}
