package graft

import graft.operators.{AnnIndex, Similarity}
import org.apache.spark.sql.functions._

/** Persisted IVF serving index: recall must carry over from ivfTopK
  * (identical training/assignment), reads must be pruned to the probed
  * cells' files, and maintenance must follow the manifest commit
  * protocol (atomic visibility, compaction, vacuum).
  */
class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Tables(spark, sfDir).embeddings

  private def topKSet(df: org.apache.spark.sql.DataFrame) =
    df.select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet

  test("indexed IVF recall vs brute force is >= 0.8 and matches ivfTopK exactly") {
    val probes     = emb.filter($"vec_id" < 20)
    val candidates = emb.filter($"vec_id" >= 20)
    val dir = java.nio.file.Files.createTempDirectory("annidx").toString
    AnnIndex.build(candidates, "vec_id", "embedding", dir, nCells = 16)
    val indexed = topKSet(AnnIndex.topK(probes, "vec_id", "embedding", dir, k = 10, nProbe = 8))
    val exact = topKSet(Similarity.bruteForceTopK(probes, candidates, "vec_id", "embedding", k = 10))
    val recall = exact.intersect(indexed).size.toDouble / exact.size
    assert(recall >= 0.8, s"indexed IVF recall $recall too low")
    // same trainer, same assignment, same probe-cell selection — the
    // persisted layout must not change WHAT the lists contain
    val transient_ = topKSet(Similarity.ivfTopK(probes, candidates, "vec_id", "embedding",
      k = 10, nCells = 16, nProbe = 8))
    assert(indexed == transient_, "persisted index diverged from ivfTopK")
  }

  test("multi-file cells: staging splits past one-file-per-cell without changing answers") {
    val probes     = emb.filter($"vec_id" < 20)
    val candidates = emb.filter($"vec_id" >= 20)
    val oneDir   = java.nio.file.Files.createTempDirectory("annidx_one").toString
    val splitDir = java.nio.file.Files.createTempDirectory("annidx_split").toString
    AnnIndex.build(candidates, "vec_id", "embedding", oneDir, nCells = 8)
    AnnIndex.build(candidates, "vec_id", "embedding", splitDir, nCells = 8, splits = Some(32))
    assert(AnnIndex.currentManifest(spark, splitDir).vectors.size >
      AnnIndex.currentManifest(spark, oneDir).vectors.size,
      "splits did not widen the staged layout")
    val a = topKSet(AnnIndex.topK(probes, "vec_id", "embedding", oneDir, k = 10, nProbe = 4))
    val b = topKSet(AnnIndex.topK(probes, "vec_id", "embedding", splitDir, k = 10, nProbe = 4))
    assert(a == b, "split staging changed top-k answers")
  }

  test("deleteVecs tombstones serve-side; compact drops rows and answers are stable throughout") {
    val probes     = emb.filter($"vec_id" < 10)
    val candidates = emb.filter($"vec_id" >= 10)
    val dir = java.nio.file.Files.createTempDirectory("annidx_del").toString
    AnnIndex.build(candidates, "vec_id", "embedding", dir, nCells = 8)
    val before15 = AnnIndex.topK(probes, "vec_id", "embedding", dir, k = 15, nProbe = 8)
      .orderBy("probe_id", "rank")
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSeq

    // delete 5 ids that actually rank somewhere, so the identity below
    // exercises real removals
    val deleted = before15.map(_._2).distinct.take(5).toSet
    AnnIndex.deleteVecs(deleted.toSeq.toDF("vec_id"), "vec_id", dir)

    def after10 = AnnIndex.topK(probes, "vec_id", "embedding", dir, k = 10, nProbe = 8)
      .orderBy("probe_id", "rank")
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSeq
    // exact identity: post-delete top-10 per probe == pre-delete top-15
    // with the deleted ids struck out, truncated to 10 (≤ 5 removals
    // per probe by construction) — ranking is otherwise untouched
    val expect = before15.groupBy(_._1).view.mapValues(
      _.map(_._2).filterNot(deleted).take(10)).toMap
    val got0 = after10.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(got0 == expect, "tombstoned top-k is not the struck-out pre-delete ranking")
    assert(got0.values.flatten.forall(id => !deleted(id)))

    // double delete: no-op; compact: physical drop, same answers
    val v = AnnIndex.versions(spark, dir)
    AnnIndex.deleteVecs(deleted.toSeq.toDF("vec_id"), "vec_id", dir)
    assert(AnnIndex.versions(spark, dir) == v)
    AnnIndex.compact(spark, dir)
    val m = AnnIndex.currentManifest(spark, dir)
    assert(m.deletes.isEmpty, "compact left tombstones")
    val left = spark.read.parquet(m.vectors.map(p => s"$dir/${p._2}"): _*)
      .filter(col("neighbor_id").isin(deleted.toSeq: _*)).count()
    assert(left == 0, s"$left deleted vectors survived compaction")
    assert(after10.groupBy(_._1).view.mapValues(_.map(_._2)).toMap == expect,
      "compaction changed post-delete answers")
  }

  test("a probe reads only its probed cells' files (manifest-pruned scan)") {
    val dir = java.nio.file.Files.createTempDirectory("annidx_prune").toString
    AnnIndex.build(emb.filter($"vec_id" >= 5), "vec_id", "embedding", dir, nCells = 16)
    val m = AnnIndex.currentManifest(spark, dir)
    val allFiles = m.vectors.size
    val nProbe = 4
    val q = AnnIndex.topK(emb.filter($"vec_id" === 0), "vec_id", "embedding", dir,
      k = 5, nProbe = nProbe)
    val read = q.inputFiles.filter(_.contains("/vectors/")).toSeq
    assert(read.nonEmpty, "vector files not visible in the planned scan")
    val cellsRead = read.flatMap(_.split('/').collectFirst {
      case s if s.startsWith("cell=") => s.stripPrefix("cell=").toInt
    }).distinct
    assert(cellsRead.size <= nProbe,
      s"expected <= $nProbe cells' files read, got cells $cellsRead")
    assert(read.size < allFiles,
      s"prune read ${read.size} of $allFiles files — nothing pruned")
  }

  test("delta assignment against persisted centroids: grown index == one-shot index") {
    // assignment is a pure per-row function of (vector, centroids), so
    // lists(old) ∪ assign(delta) must equal lists(old ∪ delta) for the
    // SAME centroids — build both ways with the same training corpus
    val probes = emb.filter($"vec_id" < 5)
    val old_   = emb.filter($"vec_id" >= 5 && pmod($"vec_id", lit(10)) =!= 7)
    val delta  = emb.filter($"vec_id" >= 5 && pmod($"vec_id", lit(10)) === 7)

    val grownDir = java.nio.file.Files.createTempDirectory("annidx_grown").toString
    AnnIndex.build(old_, "vec_id", "embedding", grownDir, nCells = 16)
    AnnIndex.addDelta(delta, "vec_id", "embedding", grownDir)
    assert(AnnIndex.versions(spark, grownDir) == Seq(1L, 2L))

    // one-shot comparator with the SAME centroids: seed a fresh index
    // from the same training subset, then fold the rest in one delta
    val cmpDir = java.nio.file.Files.createTempDirectory("annidx_cmp").toString
    AnnIndex.build(old_, "vec_id", "embedding", cmpDir, nCells = 16)
    AnnIndex.addDelta(delta, "vec_id", "embedding", cmpDir)
    AnnIndex.compact(spark, cmpDir)

    val a = topKSet(AnnIndex.topK(probes, "vec_id", "embedding", grownDir, k = 10, nProbe = 8))
    val b = topKSet(AnnIndex.topK(probes, "vec_id", "embedding", cmpDir, k = 10, nProbe = 8))
    assert(a == b, "compaction/delta layout changed answers")
    // the delta's vectors are genuinely servable
    val deltaIds = delta.select($"vec_id".cast("long")).as[Long].collect().toSet
    assert(a.exists { case (_, n) => deltaIds.contains(n) } ||
      topKSet(AnnIndex.topK(probes, "vec_id", "embedding", grownDir, k = 50, nProbe = 16))
        .exists { case (_, n) => deltaIds.contains(n) },
      "no delta vector ever surfaces as a neighbor")
  }

  test("crash between staging and commit leaves the old version; vacuum sweeps; compact folds") {
    val dir = java.nio.file.Files.createTempDirectory("annidx_maint").toString
    AnnIndex.build(emb.filter($"vec_id" >= 5 && $"vec_id" < 350),
      "vec_id", "embedding", dir, nCells = 8)
    val probes = emb.filter($"vec_id" < 5)
    val before = topKSet(AnnIndex.topK(probes, "vec_id", "embedding", dir, k = 5, nProbe = 8))

    // "crash": stage vector files with no manifest claim — invisible
    val m = AnnIndex.currentManifest(spark, dir)
    emb.filter($"vec_id" >= 350 && $"vec_id" < 400)
      .select($"vec_id".cast("long").as("neighbor_id"),
        graft.functions.VectorFunctions.asDouble($"embedding").as("__cv"),
        lit(3).as("cell"))
      .write.partitionBy("cell")
      .parquet(s"$dir/vectors/deadbeefdeadbeefdeadbeefdeadbeef")
    assert(AnnIndex.versions(spark, dir) == Seq(1L))
    assert(topKSet(AnnIndex.topK(probes, "vec_id", "embedding", dir, k = 5, nProbe = 8)) == before)
    val swept = AnnIndex.vacuum(spark, dir, keepVersions = 1, graceMs = 0L)
    assert(swept >= 1)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$dir/vectors/deadbeefdeadbeefdeadbeefdeadbeef")))

    // three deltas accumulate multi-file cells; compact folds to one
    // file per cell, vacuum retires the superseded files, answers fixed
    (0 until 3).foreach { i =>
      AnnIndex.addDelta(emb.filter($"vec_id" >= 350 + i * 50 && $"vec_id" < 400 + i * 50),
        "vec_id", "embedding", dir)
    }
    val expect = topKSet(AnnIndex.topK(probes, "vec_id", "embedding", dir, k = 5, nProbe = 8))
    val folded = AnnIndex.compact(spark, dir)
    assert(folded > 0)
    val after = AnnIndex.currentManifest(spark, dir)
    assert(after.vectors.groupBy(_._1).forall(_._2.size == 1))
    assert(AnnIndex.vacuum(spark, dir, keepVersions = 1, graceMs = 0L) > 0)
    assert(topKSet(AnnIndex.topK(probes, "vec_id", "embedding", dir, k = 5, nProbe = 8)) == expect)
  }

  test("filtered ANN: meta sidecar gates candidates, CDC metadata wins latest, vacuum keeps it") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("annidx_meta").toString
    val base = emb.filter($"vec_id" >= 5 && $"vec_id" < 300)
    AnnIndex.build(base, "vec_id", "embedding", dir, nCells = 8,
      metaCols = Seq("label"))
    val probes = emb.filter($"vec_id" < 3)
    def ids(where: Option[org.apache.spark.sql.Column]) =
      AnnIndex.topK(probes, "vec_id", "embedding", dir, k = 10, nProbe = 8, where = where)
        .select("neighbor_id").as[Long].collect().toSet
    val unfiltered = ids(None)
    val lab0 = base.filter($"label" === 0).select("vec_id").as[Long].collect().toSet
    val got0 = ids(Some(col("label") === 0))
    assert(got0.nonEmpty && got0.subsetOf(lab0),
      "filtered ANN must return only allowed-label neighbors")
    assert(got0 != unfiltered)
    // CDC: one vector's label flips 0 -> 9; its LATEST metadata decides
    val victim = got0.head
    val upd = base.filter($"vec_id" === victim)
      .withColumn("label", org.apache.spark.sql.functions.lit(9))
    AnnIndex.applyCdc(upserts = upd,
      removalIds = base.filter($"vec_id" === victim).select("vec_id"),
      "vec_id", "embedding", dir)
    assert(!ids(Some(col("label") === 0)).contains(victim),
      "CDC'd metadata must win over the build-time sidecar row")
    assert(ids(Some(col("label") === 9)).contains(victim))
    // maintenance keeps the sidecar
    AnnIndex.compact(spark, dir)
    AnnIndex.vacuum(spark, dir, keepVersions = 1, graceMs = 0L)
    assert(ids(Some(col("label") === 9)).contains(victim),
      "vacuum must not sweep live meta sidecar dirs")
    // sidecar-free index refuses filtered queries loudly
    val bare = java.nio.file.Files.createTempDirectory("annidx_nometa").toString
    AnnIndex.build(base, "vec_id", "embedding", bare, nCells = 8)
    val e = intercept[IllegalArgumentException] {
      AnnIndex.topK(probes, "vec_id", "embedding", bare, k = 5,
        where = Some(col("label") === 0)).collect()
    }
    assert(e.getMessage.contains("metaCols"))
  }

  test("persisted IVFPQ: recall >= 0.8, deterministic serve, ADC scan prunes to probed cells") {
    val probes = emb.filter($"vec_id" < 5)
    val corpus = emb.filter($"vec_id" >= 5)
    val dir = java.nio.file.Files.createTempDirectory("annidx_pq").toString
    AnnIndex.build(corpus, "vec_id", "embedding", dir, nCells = 16,
      pq = Some(AnnIndex.PqSpec(m = 8, nCodes = 16)))
    val q = AnnIndex.pqTopK(probes, "vec_id", "embedding", dir,
      k = 10, nProbe = 8, shortlist = 200)
    val got = topKSet(q)
    val exact = topKSet(Similarity.bruteForceTopK(probes, corpus, "vec_id", "embedding", k = 10))
    val recall = exact.intersect(got).size.toDouble / exact.size
    assert(recall >= 0.8, s"persisted IVFPQ recall $recall too low")
    // deterministic: bit-exact manifest quantizers + deterministic ties
    val again = topKSet(AnnIndex.pqTopK(probes, "vec_id", "embedding", dir,
      k = 10, nProbe = 8, shortlist = 200))
    assert(got == again, "pqTopK must be deterministic run to run")
    // the ADC scan plans only the probed cells' files
    val m = AnnIndex.currentManifest(spark, dir)
    val nProbe = 4
    val q4 = AnnIndex.pqTopK(emb.filter($"vec_id" === 0), "vec_id", "embedding", dir,
      k = 5, nProbe = nProbe)
    val read = q4.inputFiles.filter(_.contains("/vectors/")).toSeq
    val cellsRead = read.flatMap(_.split('/').collectFirst {
      case s if s.startsWith("cell=") => s.stripPrefix("cell=").toInt
    }).distinct
    assert(read.nonEmpty && cellsRead.size <= nProbe,
      s"expected <= $nProbe cells' files in the ADC plan, got cells $cellsRead")
    assert(read.size < m.vectors.size, "nothing pruned from the PQ serve scan")
    // plan shape: the ADC shortlist reaches candidates through the cell
    // equi-join — degenerating to a cross/nested-loop product would
    // silently lose the whole IVF pruning at scale
    val plan = physicalPlan(q4)
    val nested = plan.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }
    assert(nested.isEmpty, "pqTopK must equi-join on cell, not cross-product")
    // a PQ query against a codes-free index refuses loudly
    val bare = java.nio.file.Files.createTempDirectory("annidx_nopq").toString
    AnnIndex.build(corpus, "vec_id", "embedding", bare, nCells = 8)
    val e = intercept[IllegalArgumentException] {
      AnnIndex.pqTopK(probes, "vec_id", "embedding", bare, k = 5).collect()
    }
    assert(e.getMessage.contains("codebooks"))
  }

  test("filtered PQ serving: sidecar predicate gates the ADC slice, deterministic, loud without a sidecar") {
    import org.apache.spark.sql.functions.col
    val probes = emb.filter($"vec_id" < 5)
    val corpus = emb.filter($"vec_id" >= 5)
    val dir = java.nio.file.Files.createTempDirectory("annidx_pqf").toString
    AnnIndex.build(corpus, "vec_id", "embedding", dir, nCells = 8,
      pq = Some(AnnIndex.PqSpec(m = 8, nCodes = 16)), metaCols = Seq("label"))
    def ids(where: Option[org.apache.spark.sql.Column]) =
      AnnIndex.pqTopK(probes, "vec_id", "embedding", dir, k = 10, nProbe = 8,
          shortlist = 100, where = where)
        .select("neighbor_id").as[Long].collect().toSet
    val lab01 = corpus.filter($"label".isin(0, 1)).select("vec_id").as[Long].collect().toSet
    val got = ids(Some(col("label").isin(0, 1)))
    assert(got.nonEmpty && got.subsetOf(lab01),
      "filtered PQ must return only allowed-label neighbors")
    assert(got != ids(None))
    assert(got == ids(Some(col("label").isin(0, 1))), "filtered PQ must be deterministic")
    // codes index without a sidecar refuses filtered queries loudly
    val bare = java.nio.file.Files.createTempDirectory("annidx_pqf_bare").toString
    AnnIndex.build(corpus, "vec_id", "embedding", bare, nCells = 8,
      pq = Some(AnnIndex.PqSpec(m = 8, nCodes = 16)))
    val e = intercept[IllegalArgumentException] {
      AnnIndex.pqTopK(probes, "vec_id", "embedding", bare, k = 5,
        where = Some(col("label") === 0)).collect()
    }
    assert(e.getMessage.contains("metaCols"))
  }

  test("IVFPQ lifecycle parity: delta/CDC encode against persisted quantizers == one-shot build") {
    val probes = emb.filter($"vec_id" < 5)
    val all    = emb.filter($"vec_id" >= 5)
    val old_   = all.filter(pmod($"vec_id", lit(10)) =!= 7)
    val delta  = all.filter(pmod($"vec_id", lit(10)) === 7)
    // grow by delta: codes come from the PERSISTED codebooks, so the
    // grown index must answer exactly like assignments over old ∪ delta
    val grown = java.nio.file.Files.createTempDirectory("annidx_pq_grown").toString
    AnnIndex.build(old_, "vec_id", "embedding", grown, nCells = 16,
      pq = Some(AnnIndex.PqSpec(m = 8, nCodes = 16)))
    AnnIndex.addDelta(delta, "vec_id", "embedding", grown)
    def serve(d: String) = AnnIndex.pqTopK(probes, "vec_id", "embedding", d,
        k = 10, nProbe = 8, shortlist = 100)
      .orderBy("probe_id", "rank").collect().map(_.toSeq).toSeq
    val before = serve(grown)
    // compact folds the per-delta files; answers must not move
    assert(AnnIndex.compact(spark, grown) > 0)
    assert(serve(grown) == before, "compaction changed PQ answers")
    // CDC: delete one indexed id, re-insert it — codes re-encode
    // against the same persisted quantizers, answers deterministic
    val victim = before.head(1).asInstanceOf[Long]
    AnnIndex.applyCdc(
      upserts = all.filter($"vec_id" === victim),
      removalIds = all.filter($"vec_id" === victim).select("vec_id"),
      "vec_id", "embedding", grown)
    assert(serve(grown) == before,
      "re-inserting the same vector via CDC must leave PQ answers unchanged")
  }

  test("rebuild at the same path: the manifest cache must not serve the old tree (dense side)") {
    val dir = java.nio.file.Files.createTempDirectory("annidx_rebuild").toString
    val oldCorpus = emb.filter($"vec_id" >= 5 && $"vec_id" < 100)
    val newCorpus = emb.filter($"vec_id" >= 100 && $"vec_id" < 200)
    AnnIndex.build(oldCorpus, "vec_id", "embedding", dir, nCells = 4)
    def served() = AnnIndex.topK(emb.filter($"vec_id" < 2), "vec_id", "embedding",
        dir, k = 10, nProbe = 4)
      .select("neighbor_id").as[Long].collect().toSet
    assert(served().forall(_ < 100))
    val root = java.nio.file.Paths.get(dir)
    val walk = java.nio.file.Files.walk(root).sorted(java.util.Comparator.reverseOrder())
    try walk.forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
    finally walk.close()
    AnnIndex.build(newCorpus, "vec_id", "embedding", dir, nCells = 4)
    val after = served()
    assert(after.nonEmpty && after.forall(id => id >= 100 && id < 200),
      s"rebuilt ANN index must serve the NEW corpus, got $after")
  }

  test("multi-file compaction fold: every written file lands in the manifest, answers identical") {
    // regression for the Map.flatMap-dedup manifest-assembly bug: a
    // fold writing SEVERAL files per cell must list them all
    val probes = emb.filter($"vec_id" < 5)
    val corpus = emb.filter($"vec_id" >= 5)
    val dir = java.nio.file.Files.createTempDirectory("annidx_multifold").toString
    AnnIndex.build(corpus, "vec_id", "embedding", dir, nCells = 4)
    def serve() = AnnIndex.topK(probes, "vec_id", "embedding", dir, k = 10, nProbe = 4)
      .orderBy("probe_id", "rank").collect().map(_.toSeq).toSeq
    val before = serve()
    assert(AnnIndex.compact(spark, dir, targetFileBytes = 4096) > 0)
    val m = AnnIndex.currentManifest(spark, dir)
    assert(m.vectors.groupBy(_._1).exists(_._2.size >= 2),
      "forced-split compact must write several files for at least one cell")
    // every parquet file on disk under a live staging dir is in the manifest
    AnnIndex.vacuum(spark, dir, keepVersions = 1, graceMs = 0L)
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val onDisk = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(s"$dir/vectors"), true)
      val b = Seq.newBuilder[String]
      while (it.hasNext) {
        val f = it.next().getPath
        if (f.getName.endsWith(".parquet"))
          b += f.toUri.getPath.stripPrefix(root.toUri.getPath.stripSuffix("/") + "/")
      }
      b.result().toSet
    }
    assert(onDisk == m.vectors.map(_._2).toSet,
      s"manifest and disk disagree after fold+vacuum: ${onDisk.size} on disk vs ${m.vectors.size} listed")
    assert(serve() == before, "multi-file fold changed answers")
  }

  test("compact folds the vector-meta sidecar: CDC batches -> one dir, answers identical, dead ids dropped") {
    import org.apache.spark.sql.functions.{col, lit}
    val dir = java.nio.file.Files.createTempDirectory("annidx_metafold").toString
    val base = emb.filter($"vec_id" >= 5 && $"vec_id" < 300)
    AnnIndex.build(base, "vec_id", "embedding", dir, nCells = 8, metaCols = Seq("label"))
    val probes = emb.filter($"vec_id" < 3)
    // ten CDC batches: ids 10..19 flip label to 90+i one at a time;
    // id 20 deleted in batch 0, re-inserted with label 77 in batch 5;
    // id 21 deleted in batch 1 for good
    (0 until 10).foreach { i =>
      val id = 10L + i
      val up = base.filter($"vec_id" === id).withColumn("label", lit(90 + i))
        .unionByName(
          if (i == 5) base.filter($"vec_id" === 20L).withColumn("label", lit(77))
          else base.filter(lit(false)))
      val rmIds = Seq(id) ++ (i match {
        case 0 => Seq(20L); case 1 => Seq(21L); case _ => Nil
      })
      AnnIndex.applyCdc(upserts = up,
        removalIds = base.filter(col("vec_id").isin(rmIds.map(Long.box): _*)).select("vec_id"),
        "vec_id", "embedding", dir)
    }
    val before = AnnIndex.currentManifest(spark, dir)
    assert(before.metaDirs.size == 11, s"expected 11 sidecar dirs, got ${before.metaDirs.size}")
    def filtered(pred: org.apache.spark.sql.Column) =
      AnnIndex.topK(probes, "vec_id", "embedding", dir, k = 10, nProbe = 8,
          where = Some(pred))
        .orderBy("probe_id", "rank").collect().map(_.toSeq).toSeq
    val lab0Before = filtered(col("label") === 0)
    val resBefore = filtered(col("label") === 77)
    AnnIndex.compact(spark, dir)
    val after = AnnIndex.currentManifest(spark, dir)
    assert(after.metaDirs.size == 1,
      s"compact must fold the sidecar to ONE dir, got ${after.metaDirs.size}")
    assert(filtered(col("label") === 0) == lab0Before,
      "filtered ANN answers must be identical across the fold")
    assert(filtered(col("label") === 77) == resBefore && resBefore.nonEmpty,
      "a vector re-inserted after its tombstone keeps its latest metadata")
    val folded = spark.read.parquet(s"$dir/${after.metaDirs.head}")
    assert(folded.filter(col("neighbor_id") === 21L).isEmpty,
      "tombstoned vector's sidecar row must drop at the fold")
    assert(folded.groupBy("neighbor_id").count().filter(col("count") > 1).isEmpty,
      "folded sidecar must be latest-wins unique per vector")
    AnnIndex.vacuum(spark, dir, keepVersions = 1, graceMs = 0L)
    val metaRoot = new org.apache.hadoop.fs.Path(s"$dir/meta")
    val fs = metaRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(metaRoot).length == 1,
      "vacuum must sweep the superseded sidecar dirs")
    assert(filtered(col("label") === 0) == lab0Before, "answers stable after vacuum")
  }

  test("hybrid serving: the nProbe knob trades recall for reads, overlap vs the exact fusion pinned") {
    // search_hybrid_served runs nProbe = nCells (exact — hash-matched
    // against the from-scratch oracle); this pins what the KNOB does:
    // at nProbe = half the cells, the dense branch is approximate and
    // the fused top-5 must still overlap the exact fusion heavily
    // (RRF dampens dense-branch misses — the lexical branch is exact
    // either way). Documented trade, measured, not asserted vacuously.
    val spark0 = spark
    import org.apache.spark.sql.functions.col
    val docs = Tables(spark0, sfDir).documents
      .repartition(4, col("doc_id")).select("doc_id", "text")
    val probes = Seq(0L, 7L, 42L)
    val lexDir = java.nio.file.Files.createTempDirectory("hyb_lex").toString
    graft.operators.InvertedIndex.build(docs, "doc_id", "text", lexDir)
    val annDir = java.nio.file.Files.createTempDirectory("hyb_ann").toString
    AnnIndex.build(emb.filter(!$"vec_id".isin(probes: _*)),
      "vec_id", "embedding", annDir, nCells = 16)
    def hybrid(nProbe: Int) = {
      val lex = graft.operators.InvertedIndex.bm25TopK(docs, "doc_id", "text",
          lexDir, probes, k = 20)
        .select(col("probe_id"), col("doc_id").as("__id"), col("rank").as("__lex_rank"))
      val den = AnnIndex.topK(emb.filter($"vec_id".isin(probes: _*)),
          "vec_id", "embedding", annDir, k = 20, nProbe = nProbe)
        .select(col("probe_id"), col("neighbor_id").as("__id"), col("rank").as("__den_rank"))
      graft.operators.TextAnalysis.rrfFuseRanked(lex, den, "doc_id", k = 5, rrfK = 60)
        .select("probe_id", "doc_id").as[(Long, Long)].collect().toSet
    }
    val exact  = hybrid(nProbe = 16)
    val approx = hybrid(nProbe = 8)
    val overlap = exact.intersect(approx).size.toDouble / exact.size
    assert(overlap >= 0.6, s"approximate hybrid fusion overlap $overlap too low")
  }

  test("compaction that loses the claim race retries and lands (delta wins, compact folds it too)") {
    // the dense-side twin of the InvertedIndex race spec: round 11's
    // compact require-threw on a lost race (inconsistent with
    // addDelta/applyCdc's retry posture); the seam deterministically
    // makes compact the loser.
    val dir = java.nio.file.Files.createTempDirectory("annidx_crace").toString
    AnnIndex.build(emb.filter($"vec_id" >= 5 && $"vec_id" < 400),
      "vec_id", "embedding", dir, nCells = 8)
    AnnIndex.addDelta(emb.filter($"vec_id" >= 400 && $"vec_id" < 450),
      "vec_id", "embedding", dir)
    val folded = AnnIndex.compactWithHook(spark, dir,
      () => AnnIndex.addDelta(emb.filter($"vec_id" >= 450 && $"vec_id" < 500),
        "vec_id", "embedding", dir))
    assert(folded > 0, "compact returned without folding after the lost race")
    assert(AnnIndex.versions(spark, dir).last == 4L)
    val m = AnnIndex.currentManifest(spark, dir)
    assert(m.vectors.groupBy(_._1).forall(_._2.size == 1),
      "the retried compact must fold the racing delta's files too")
    val indexed = spark.read.parquet(
      m.vectors.map { case (_, p) => s"$dir/$p" }: _*).count()
    val serveable = emb.filter($"vec_id" >= 5 && $"vec_id" < 500).count()
    assert(indexed == serveable, s"lost update after raced compact: $indexed of $serveable")
  }

  test("two racing delta maintainers both land, no lost update") {
    val dir = java.nio.file.Files.createTempDirectory("annidx_race").toString
    AnnIndex.build(emb.filter($"vec_id" >= 5 && $"vec_id" < 400),
      "vec_id", "embedding", dir, nCells = 8)
    val d1 = emb.filter($"vec_id" >= 400 && $"vec_id" < 450)
    val d2 = emb.filter($"vec_id" >= 450 && $"vec_id" < 500)
    val t1 = new Thread(() => AnnIndex.addDelta(d1, "vec_id", "embedding", dir))
    val t2 = new Thread(() => AnnIndex.addDelta(d2, "vec_id", "embedding", dir))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert(AnnIndex.versions(spark, dir) == Seq(1L, 2L, 3L))
    val n = AnnIndex.currentManifest(spark, dir).vectors.size
    val serveable = emb.filter($"vec_id" >= 5 && $"vec_id" < 500).count()
    val indexed = spark.read.parquet(
      AnnIndex.currentManifest(spark, dir).vectors.map { case (_, p) => s"$dir/$p" }: _*).count()
    assert(indexed == serveable, s"lost update: $indexed of $serveable vectors indexed (files=$n)")
  }
}
