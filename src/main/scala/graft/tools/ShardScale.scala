package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{InvertedIndex, ShardedIndex}

/** Scale measurement for the document-partitioned federation
  * ([[ShardedIndex]]) against the single flat index — the three claims
  * the §2 row makes, priced:
  *
  *  1. '''serve''': the federated fan-out answers from S unioned
  *     bucket-pruned scans with driver-side global stats — the added
  *     cost over one index should be plan width (S× scans of 1/S the
  *     rows each), not read amplification.
  *  2. '''maintenance isolation''': a churn-sized delta routes to only
  *     the shards its ids hash to — the per-shard deltas are each
  *     churn/S-sized, and S-1 shards' manifests never advance when the
  *     batch is small enough to miss them (measured with a 3-doc
  *     batch).
  *  3. '''build''': the federation pays one extra corpus pass (the
  *     routing stage) + S independent builds over 1/S slices — at real
  *     scale those S builds run on S clusters; the single-process sum
  *     printed here is the WORST case (zero build parallelism), and
  *     even it is bounded by ~(1 route pass + the flat build's work).
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> [SPARK_GRAFT_SHARDS=3]
  *        runMain graft.tools.ShardScale
  * Prints one labeled line per measurement; serves are min-of-3.
  */
object ShardScale {
  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
  }
  private def minOf3(f: => Unit): Double =
    (1 to 3).map(_ => timed(f)._2).min

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val shards = sys.env.getOrElse("SPARK_GRAFT_SHARDS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val nDocs = docs.count()
    val queries = Seq("fast key scan", "table value", "row group filter")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // alternate which variant pays the cold first-build (addendum-1
    // ordered-A/B lesson) via SPARK_GRAFT_FLAT_FIRST
    val flatFirst = sys.env.get("SPARK_GRAFT_FLAT_FIRST").forall(_ == "1")
    val flat = java.nio.file.Files.createTempDirectory("shsc_flat").toString
    val fed  = java.nio.file.Files.createTempDirectory("shsc_fed").toString
    val grow = docs.filter(pmod(col("doc_id"), lit(100)) =!= 0)
    val delta = docs.filter(pmod(col("doc_id"), lit(100)) === 0)
    def buildFlat() = timed(InvertedIndex.build(grow, "doc_id", "text", flat))._2
    def buildFed() = timed(ShardedIndex.buildSharded(
      grow, "doc_id", "text", fed, shards))._2
    val (flatBuildS, fedBuildS) =
      if (flatFirst) { val a = buildFlat(); val b = buildFed(); (a, b) }
      else { val b = buildFed(); val a = buildFlat(); (a, b) }

    val flatServeS = minOf3(noop(
      InvertedIndex.bm25TopKText(spark, flat, queries, k = 5)))
    val fedServeS = minOf3(noop(
      ShardedIndex.bm25TopKTextSharded(spark, fed, queries, k = 5)))

    // maintenance: the same ~1% delta into both layouts; then a 3-doc
    // point batch to show isolation (how many shards advance)
    val (_, flatDeltaS) = timed(
      InvertedIndex.addDelta(delta, "doc_id", "text", flat))
    val (_, fedDeltaS) = timed(
      ShardedIndex.addDeltaSharded(delta, "doc_id", "text", fed))
    val vBefore = (0 until shards).map(i =>
      InvertedIndex.currentManifest(spark, ShardedIndex.shardDir(fed, i)).version)
    val tiny = docs.limit(3).withColumn("doc_id", col("doc_id") + 10000000L)
    ShardedIndex.addDeltaSharded(tiny, "doc_id", "text", fed)
    val advanced = (0 until shards).count(i =>
      InvertedIndex.currentManifest(spark, ShardedIndex.shardDir(fed, i)).version
        > vBefore(i))

    val flatServe2S = minOf3(noop(
      InvertedIndex.bm25TopKText(spark, flat, queries, k = 5)))
    val fedServe2S = minOf3(noop(
      ShardedIndex.bm25TopKTextSharded(spark, fed, queries, k = 5)))

    // END-TO-END sharded CDC: a Graft catalog table is the system of
    // record; ten churn-sized I/U/D batches flow through
    // StreamIndex.shardedCdcBatch with the catalogResolver (leaving
    // texts point-looked-up from the catalog) and then MERGE into the
    // catalog — the full deployment loop, timed like the single-index
    // cdc10 rung (InvIndexScale [invidx-cdc]). This is also the axis
    // that prices the round-14 one-batch-scan staging fix at churn
    // size: each batch is staged once, not re-read per affected shard.
    val warehouse = java.nio.file.Files.createTempDirectory("shsc_wh").toString
    spark.conf.set("spark.sql.catalog.shsccat", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.shsccat.warehouse", warehouse)
    // merge-on-read: the system-of-record's MERGE stays O(churn) writes
    // (position deletes + batch rows per commit) — the deployment
    // posture; a COW table would rewrite affected files per batch and
    // dominate this axis with target-rewrite cost
    spark.sql("""CREATE TABLE shsccat.db.docs (doc_id BIGINT, text STRING)
      TBLPROPERTIES ('graft.merge.mode' = 'merge-on-read')""")
    docs.createOrReplaceTempView("shsc_seed")
    spark.sql("INSERT INTO shsccat.db.docs SELECT doc_id, text FROM shsc_seed")
    val fedCdc = java.nio.file.Files.createTempDirectory("shsc_fed_cdc").toString
    ShardedIndex.buildSharded(spark.table("shsccat.db.docs"), "doc_id", "text",
      fedCdc, shards)
    val cfg = graft.streaming.StreamIndex.Config(indexDir = fedCdc,
      checkpointDir = java.nio.file.Files.createTempDirectory("shsc_ckpt").toString,
      idCol = "doc_id", compactEveryBatches = None)
    val resolver = graft.streaming.StreamIndex.catalogResolver(
      spark, "shsccat.db.docs", "doc_id", "text")
    val mod = pmod(col("doc_id"), lit(100L))
    var cdcTotal = 0.0
    (0 until 10).foreach { i =>
      val ins = docs.filter(mod === i)
        .select(col("doc_id") + 20000000L as "doc_id", col("text"), lit("I").as("op"))
      val upd = docs.filter(mod === (50 + i))
        .select(col("doc_id"), concat_ws(" ", col("text"), col("text")).as("text"),
          lit("U").as("op"))
      val del = docs.filter(mod === (70 + i))
        .select(col("doc_id"), lit(null).cast("string").as("text"), lit("D").as("op"))
      val batch = ins.unionByName(upd).unionByName(del)
      cdcTotal += timed {
        // crash-safe order: index half (stamped) first, catalog second
        graft.streaming.StreamIndex.shardedCdcBatch(cfg, "text", "op", resolver)(
          batch, i.toLong)
        batch.createOrReplaceTempView("shsc_cdc")
        spark.sql("""MERGE INTO shsccat.db.docs t USING shsc_cdc s ON t.doc_id = s.doc_id
          WHEN MATCHED AND s.op = 'D' THEN DELETE
          WHEN MATCHED THEN UPDATE SET t.text = s.text
          WHEN NOT MATCHED AND s.op != 'D' THEN INSERT (doc_id, text) VALUES (s.doc_id, s.text)""")
      }._2
    }
    val fedCdcServe = minOf3(noop(
      ShardedIndex.bm25TopKTextSharded(spark, fedCdc, queries, k = 5)))
    val (_, fedCompactS) = timed(ShardedIndex.compactSharded(spark, fedCdc))
    val fedCdcServeC = minOf3(noop(
      ShardedIndex.bm25TopKTextSharded(spark, fedCdc, queries, k = 5)))

    // reshard: the full re-route (new root, corpus-sized) vs the
    // in-place route-diff grow (stayers untouched, leavers move) — the
    // growth-path axis. Serve checked after the in-place flip.
    val rsDest = java.nio.file.Files.createTempDirectory("shsc_rs").toString
    new java.io.File(rsDest).delete()
    val (_, fullReshardS) = timed(
      ShardedIndex.reshard(spark, fed, rsDest, shards * 2))
    val (_, inplaceReshardS) = timed(
      ShardedIndex.reshardInPlace(spark, fed, shards * 2))
    val rsServeS = minOf3(noop(
      ShardedIndex.bm25TopKTextSharded(spark, fed, queries, k = 5)))

    println(f"[shard-scale] sf=$sfDir docs=$nDocs shards=$shards flatFirst=$flatFirst")
    println(f"[shard-build] flat=$flatBuildS%.2fs federation=$fedBuildS%.2fs (route pass + $shards concurrent in-process slice builds; at scale they run on $shards clusters)")
    println(f"[shard-serve] flat=$flatServeS%.3fs federation=$fedServeS%.3fs (fan-out width vs one index)")
    println(f"[shard-delta] 1%% churn: flat=$flatDeltaS%.2fs federation=$fedDeltaS%.2fs")
    println(f"[shard-isolate] 3-doc batch advanced $advanced of $shards shards")
    println(f"[shard-serve-post-delta] flat=$flatServe2S%.3fs federation=$fedServe2S%.3fs")
    println(f"[shard-cdc] cdc10=$cdcTotal%.2fs (catalog resolve + federated fold + MERGE, " +
      f"x10 batches) serve_after_10cdc=$fedCdcServe%.3fs compact=$fedCompactS%.2fs " +
      f"serve_after_compact=$fedCdcServeC%.3fs")
    println(f"[shard-reshard] ${shards}->${shards * 2}: full_newroot=$fullReshardS%.2fs " +
      f"inplace_routediff=$inplaceReshardS%.2fs serve_after_inplace=$rsServeS%.3fs")
    spark.stop()
  }
}
