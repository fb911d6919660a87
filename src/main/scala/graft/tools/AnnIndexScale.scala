package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{AnnIndex, Similarity}

/** Scale measurement for the persisted ANN (IVF) serving index — the
  * dense twin of [[InvIndexScale]]: build vs serve vs the from-scratch
  * `ann_ivf` recompute (which re-trains and re-assigns per query), plus
  * the delta-accumulation → compaction lifecycle. The serve claim is
  * the same: a probe reads only its nProbe cells' files, so serve cost
  * tracks the probed slice, never the corpus — and compaction must
  * return an accumulated index's serve time to the freshly-built one.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.AnnIndexScale
  */
object AnnIndexScale {
  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
  }
  private def minOf3(f: => Unit): Double =
    (1 to 3).map(_ => timed(f)._2).min

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    val probes = emb.filter($"vec_id" < 5)
    val candidates = emb.filter($"vec_id" >= 5)
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val dir = java.nio.file.Files.createTempDirectory("annidx_scale").toString
    val (_, buildS) = timed(AnnIndex.build(candidates, "vec_id", "embedding", dir, nCells = 16))
    val serveS = minOf3(noop(
      AnnIndex.topK(probes, "vec_id", "embedding", dir, k = 10, nProbe = 4)))
    val scratchS = minOf3(noop(
      Similarity.ivfTopK(probes, candidates, "vec_id", "embedding", k = 10,
        nCells = 16, nProbe = 4)))

    // lifecycle: build on 90%, ten ~1% deltas, compact + vacuum
    val shard = pmod(xxhash64($"vec_id"), lit(100L))
    val dir2 = java.nio.file.Files.createTempDirectory("annidx_scale_d").toString
    AnnIndex.build(candidates.filter(shard >= 10), "vec_id", "embedding", dir2, nCells = 16)
    val serveFresh = minOf3(noop(
      AnnIndex.topK(probes, "vec_id", "embedding", dir2, k = 10, nProbe = 4)))
    var deltaTotal = 0.0
    (0 until 10).foreach { i =>
      deltaTotal += timed(AnnIndex.addDelta(
        candidates.filter(shard === i), "vec_id", "embedding", dir2))._2
    }
    val files10 = AnnIndex.currentManifest(spark, dir2).vectors.size
    val serve10d = minOf3(noop(
      AnnIndex.topK(probes, "vec_id", "embedding", dir2, k = 10, nProbe = 4)))
    val (folded, compactS) = timed(AnnIndex.compact(spark, dir2))
    val (swept, vacuumS) = timed(AnnIndex.vacuum(spark, dir2, keepVersions = 1, graceMs = 0L))
    val filesC = AnnIndex.currentManifest(spark, dir2).vectors.size
    val serveC = minOf3(noop(
      AnnIndex.topK(probes, "vec_id", "embedding", dir2, k = 10, nProbe = 4)))

    // CDC axis: ten churn-sized U/D+I batches — no stat corrections on
    // the dense side, so applyCdc is tombstone-write + cell-file append
    // + one manifest claim; serve pays the coverage anti-join until
    // compact drops the dead rows and clears the set.
    val dir3 = java.nio.file.Files.createTempDirectory("annidx_scale_c").toString
    // built WITH the label sidecar so the same CDC run also prices
    // FILTERED serving as the sidecar dirs accumulate and then fold
    AnnIndex.build(candidates.filter(shard >= 20), "vec_id", "embedding", dir3, nCells = 16,
      metaCols = Seq("label"))
    val serveFresh3 = minOf3(noop(
      AnnIndex.topK(probes, "vec_id", "embedding", dir3, k = 10, nProbe = 4)))
    def filteredServe() = minOf3(noop(
      AnnIndex.topK(probes, "vec_id", "embedding", dir3, k = 10, nProbe = 4,
        where = Some($"label".isin(0, 1, 2, 3)))))
    val fservFresh = filteredServe()
    var cdcTotal = 0.0
    (0 until 10).foreach { i =>
      val ins = candidates.filter(shard === (10 + i))
      val upd = candidates.filter(shard === (90 - i))   // re-insert same vec = an update
      val leaving = candidates.filter(shard === (90 - i) || shard === (50 + i))
        .select("vec_id")
      cdcTotal += timed(AnnIndex.applyCdc(
        upd.unionByName(ins), leaving, "vec_id", "embedding", dir3))._2
    }
    val m10c = AnnIndex.currentManifest(spark, dir3)
    val serve10c = minOf3(noop(
      AnnIndex.topK(probes, "vec_id", "embedding", dir3, k = 10, nProbe = 4)))
    val fserv10 = filteredServe()
    val metaDirs10 = m10c.metaDirs.size
    val (foldedC, compactCS) = timed(AnnIndex.compact(spark, dir3))
    AnnIndex.vacuum(spark, dir3, keepVersions = 1, graceMs = 0L)
    val serveCc = minOf3(noop(
      AnnIndex.topK(probes, "vec_id", "embedding", dir3, k = 10, nProbe = 4)))
    val fservC = filteredServe()
    val metaDirsC = AnnIndex.currentManifest(spark, dir3).metaDirs.size

    // persisted IVF+PQ serve: ADC shortlist over codes + exact re-rank
    val dirPq = java.nio.file.Files.createTempDirectory("annidx_scale_pq").toString
    val (_, buildPqS) = timed(AnnIndex.build(candidates, "vec_id", "embedding", dirPq,
      nCells = 16, pq = Some(AnnIndex.PqSpec(m = 8, nCodes = 16))))
    val servePqS = minOf3(noop(
      AnnIndex.pqTopK(probes, "vec_id", "embedding", dirPq, k = 10, nProbe = 4,
        shortlist = 100)))

    println(f"[annidx] sf=$sfDir vecs=$n build=$buildS%.2f serve=$serveS%.2f " +
      f"scratch=$scratchS%.2f serve_vs_scratch=${scratchS / serveS}%.1fx")
    println(f"[annidx-maint] serve_fresh=$serveFresh%.2f deltas10=$deltaTotal%.2f " +
      f"files_after_10d=$files10 serve_after_10d=$serve10d%.2f " +
      f"compact=$compactS%.2f folded=$folded vacuum=$vacuumS%.2f swept=$swept " +
      f"files_after_compact=$filesC serve_after_compact=$serveC%.2f")
    println(f"[annidx-cdc] serve_fresh=$serveFresh3%.2f cdc10=$cdcTotal%.2f " +
      f"tombstones_after_10=${m10c.deletes.size} files_after_10=${m10c.vectors.size} " +
      f"serve_after_10cdc=$serve10c%.2f compact=$compactCS%.2f folded=$foldedC " +
      f"serve_after_compact=$serveCc%.2f")
    println(f"[annidx-filtered] fresh=$fservFresh%.2f after_10cdc=$fserv10%.2f " +
      f"(meta_dirs=$metaDirs10) after_compact=$fservC%.2f (meta_dirs=$metaDirsC) " +
      f"unfiltered_fresh=$serveFresh3%.2f")
    println(f"[annidx-pq] build_pq=$buildPqS%.2f serve_adc=$servePqS%.2f " +
      f"serve_ivf=$serveS%.2f")
    spark.stop()
  }
}
