package graft.catalog

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Table-maintenance procedures for Graft tables — the engine-side
  * equivalents of the Iceberg procedures the reference schedules
  * against its target (rewrite_data_files / expire_snapshots /
  * remove_orphan_files; reference
  * stream-spec-yaml-example.yaml:49-61 + main.scala:121-126).
  */
object GraftMaintenance {

  /** Compact data files smaller than `smallBytes` into consolidated
    * files of roughly `targetBytes`, committing the rewrite as one
    * OCC snapshot that replaces exactly the compacted inputs — large
    * files are untouched (copy-on-write at file granularity, like
    * Iceberg's rewrite_data_files with a min-input filter).
    *
    * The rewrite itself is distributed: the small files are read as a
    * normal parquet scan (Graft data files are standard parquet) and
    * re-written through the engine's file writer, one file per
    * partition of the coalesced plan. Returns (filesBefore,
    * filesAfter); no-ops when fewer than two small files exist.
    */
  def compact(
      spark: SparkSession, tableDir: String,
      smallBytes: Long = 32L << 20, targetBytes: Long = 128L << 20): (Int, Int) = {
    val io = new GraftManifestIO(new Path(tableDir), new Configuration())
    val base = io.currentSnapshot().getOrElse(return (0, 0))
    val small = base.files.filter(_.bytes < smallBytes)
    if (small.size < 2) return (base.files.size, base.files.size)

    val schema = base.schema
    val absPaths = small.map(f => new Path(new Path(tableDir), f.path).toString)
    val nOut = math.max(1, math.ceil(small.map(_.bytes).sum.toDouble / targetBytes).toInt)
    val smallSet = small.map(_.path).toSet
    val applicableDeletes = base.deletes.filter(_.targets.exists(smallSet.contains))
    val raw = spark.read.schema(schema).parquet(absPaths: _*)
    // merge-on-read inputs: fold their position deletes into the
    // rewrite via an anti-join on (relative path, row index) — the
    // native parquet source supplies both through _metadata
    val clean =
      if (applicableDeletes.isEmpty) raw
      else {
        import org.apache.spark.sql.functions._
        val delDf = spark.read.schema(GraftDeletes.Schema)
          .parquet(applicableDeletes.map(d => new Path(new Path(tableDir), d.path).toString): _*)
        raw
          .withColumn("__rel", regexp_extract(col("_metadata.file_path"), "(data/[^/]*)$", 1))
          .withColumn("__pos", col("_metadata.row_index"))
          .join(delDf.withColumnRenamed("file", "__rel").withColumnRenamed("pos", "__pos"),
            Seq("__rel", "__pos"), "left_anti")
          .select(schema.fieldNames.map(col).toIndexedSeq: _*)
      }
    val df = clean.coalesce(nOut)

    val compactId = java.util.UUID.randomUUID().toString
    val dirStr = tableDir
    // executor-side rewrite through the format's own writer so the new
    // files carry exact manifest stats
    val newEntries = df.queryExecution.toRdd.mapPartitionsWithIndex { (pid, rows) =>
      if (!rows.hasNext) Iterator.empty
      else {
        val rel = s"data/part-compact-$compactId-$pid.parquet"
        val w = new GraftParquetIO.FileWriter(
          new Path(new Path(dirStr), rel), schema, new Configuration())
        rows.foreach(w.write)
        Iterator.single(w.finish(rel))
      }
    }.collect().toSeq // O(#output files) driver-side, bounded by nOut

    val replaced = small.map(_.path).toSet
    io.commit("compact") { cur =>
      val live = cur.map(_.files).getOrElse(Nil)
      val missing = replaced -- live.map(_.path).toSet
      if (missing.nonEmpty)
        throw new GraftCommitConflict(
          s"compaction conflicts: input file(s) replaced concurrently: ${missing.mkString(", ")}")
      // the rewrite applied the inputs' position deletes, so they fold
      // away; deletes also covering surviving files keep those targets
      val remainingDeletes = cur.map(_.deletes).getOrElse(Nil)
        .map(d => d.copy(targets = d.targets.filterNot(replaced.contains)))
        .filter(_.targets.nonEmpty)
      GraftManifestIO.Content(
        cur.map(_.schema).getOrElse(schema), cur.map(_.properties).getOrElse(Map.empty),
        live.filterNot(f => replaced.contains(f.path)) ++ newEntries, remainingDeletes)
    }
    (base.files.size, base.files.size - small.size + newEntries.size)
  }
}
