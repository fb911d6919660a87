package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted index for lexical retrieval — the 100 TB shape of
  * [[TextAnalysis.bm25TopK]].
  *
  * `search_bm25` recomputes tf/df/dl from the corpus on every query: one
  * full corpus scan + a (doc, token) shuffle per search. That is the
  * correct ORACLE shape but not a serving shape — at 100 TB a query must
  * touch only the posting lists of its own terms. This operator splits
  * the work the way every production search stack does:
  *
  *  - '''build''' (once, corpus-sized): tokenize → postings
  *    `(tok, doc_id, tf, dl)` written as parquet PARTITIONED BY
  *    `bucket = pmod(xxhash64(tok), B)`, plus a vocabulary-bounded
  *    `vocab (tok, df)` and a 1-row `stats (n, sumdl)` table, both
  *    versioned (`v=K` subdirs) so maintenance never overwrites what a
  *    concurrent reader is scanning.
  *  - '''query''' (posting-list-sized): the probe's distinct terms map
  *    to their buckets (≤ B values, collected driver-side — bounded by
  *    the constant bucket count, not by data); the postings scan carries
  *    `bucket IN (...)` as a PARTITION filter, so only the matching
  *    bucket directories are listed and read — the index's other
  *    buckets are pruned before any I/O. Scoring joins the pruned
  *    postings to the broadcast probe terms and the broadcast
  *    (vocab-subset, stats) sides; the BM25 arithmetic is the exact
  *    fixed-point form of [[TextAnalysis.bm25TopK]], so the ranking is
  *    hash-identical to the from-scratch query.
  *  - '''addDelta''' (churn-sized): new documents append their postings
  *    partitions; `vocab` merges old df + delta df (vocabulary-bounded
  *    aggregation, no postings rescan); `stats` adds the delta's doc and
  *    token counts. tf-saturation depends on the CURRENT avgdl, so
  *    postings store raw (tf, dl) and saturation is computed at query
  *    time — an index grown by deltas answers exactly like one rebuilt
  *    from scratch (oracle-gated by `search_index_delta`).
  *
  * At 100 TB: postings partitioning moves from B directories to
  * B × range-split files; the per-query read stays proportional to the
  * probe terms' posting lists (df-bounded), never the corpus.
  */
object InvertedIndex {

  val DefaultBuckets = 16

  /** Same tokenize → term-frequency pipeline as bm25TopK — MUST stay
    * expression-identical so index answers hash-match the oracle.
    */
  private def termFreqs(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
        explode(graft.functions.TextFunctions.tokens(col(textCol))).as("__tok"))
      .groupBy(col(idCol), col("__tok")).agg(count(lit(1)).as("__tf"))

  private def bucketOf(tok: Column, buckets: Int): Column =
    pmod(xxhash64(tok), lit(buckets.toLong)).cast("int")

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Latest committed metadata version under `dir/<name>` (v=K subdirs),
    * or -1 when none exist yet.
    */
  private def latestVersion(spark: SparkSession, dir: String, name: String): Int = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$name")
    val f = fs(spark, dir)
    if (!f.exists(p)) -1
    else f.listStatus(p).map(_.getPath.getName)
      .collect { case s if s.startsWith("v=") => s.drop(2).toInt }
      .foldLeft(-1)(math.max)
  }

  private def writeVersioned(df: DataFrame, dir: String, name: String, version: Int): Unit =
    df.write.mode("errorifexists").parquet(s"$dir/$name/v=$version")

  private def readLatest(spark: SparkSession, dir: String, name: String): DataFrame = {
    val v = latestVersion(spark, dir, name)
    require(v >= 0, s"inverted index at $dir has no committed $name")
    spark.read.parquet(s"$dir/$name/v=$v")
  }

  /** Build the index from scratch. One corpus pass: the (doc, token)
    * shuffle computes tf, a doc-keyed aggregate computes dl, and the
    * postings land repartitioned by bucket so each bucket directory is
    * a few dense files (at larger SF, raise the shuffle width per
    * bucket; the layout contract is only "bucket is a partition key").
    */
  def build(docs: DataFrame, idCol: String, textCol: String, dir: String,
      buckets: Int = DefaultBuckets): Unit = {
    val tf = termFreqs(docs, idCol, textCol)
    val dl = tf.groupBy(col(idCol)).agg(sum(col("__tf")).as("__dl"))
    val postings = tf.join(dl, idCol)
      .select(col(idCol).as("doc_id"), col("__tok").as("tok"),
        col("__tf").as("tf"), col("__dl").as("dl"),
        bucketOf(col("__tok"), buckets).as("bucket"))
    postings.repartition(buckets, col("bucket"))
      .write.mode("errorifexists").partitionBy("bucket").parquet(s"$dir/postings")
    val vocab = tf.groupBy(col("__tok")).agg(count(lit(1)).as("df"))
      .select(col("__tok").as("tok"), col("df"))
    writeVersioned(vocab, dir, "vocab", 0)
    val stats = dl.agg(count(lit(1)).as("n"), sum(col("__dl")).as("sumdl"))
    writeVersioned(stats, dir, "stats", 0)
  }

  /** Fold a batch of NEW documents (ids disjoint from the indexed set)
    * into the index. Work is churn-sized + vocabulary-sized: the delta
    * is tokenized once and its postings appended; vocab and stats merge
    * additively into fresh versions. The historical postings are never
    * read.
    *
    * Concurrency: one maintainer at a time. The vocab version write is
    * the FIRST action and the OCC gate: two concurrent deltas both
    * target v=K+1, and `errorifexists` fails the loser BEFORE it has
    * appended anything — a clean retry from the new latest version
    * (the catalog's commit-refusal posture). A crash BETWEEN the
    * version claim and the postings append leaves a torn delta (stats
    * count docs whose postings are absent) — at that point rebuild or
    * restore; production deployments wanting atomic delta commits put
    * the postings behind the Graft catalog's manifest instead. Readers
    * are never blocked: they resolve the latest committed version at
    * query time and postings appends are additive.
    */
  def addDelta(delta: DataFrame, idCol: String, textCol: String, dir: String,
      buckets: Int = DefaultBuckets): Unit = {
    val spark = delta.sparkSession
    val tf = termFreqs(delta, idCol, textCol)
    val dl = tf.groupBy(col(idCol)).agg(sum(col("__tf")).as("__dl"))

    // version claim first — the OCC gate (see scaladoc): a concurrent
    // maintainer fails HERE, before any postings land
    val v = latestVersion(spark, dir, "vocab")
    val deltaVocab = tf.groupBy(col("__tok")).agg(count(lit(1)).as("df"))
      .select(col("__tok").as("tok"), col("df"))
    val mergedVocab = readLatest(spark, dir, "vocab").unionByName(deltaVocab)
      .groupBy(col("tok")).agg(sum(col("df")).as("df"))
    writeVersioned(mergedVocab, dir, "vocab", v + 1)

    val deltaStats = dl.agg(count(lit(1)).as("n"), sum(col("__dl")).as("sumdl"))
    val mergedStats = readLatest(spark, dir, "stats").unionByName(deltaStats)
      .agg(sum(col("n")).as("n"), sum(col("sumdl")).as("sumdl"))
    writeVersioned(mergedStats, dir, "stats", v + 1)

    val postings = tf.join(dl, idCol)
      .select(col(idCol).as("doc_id"), col("__tok").as("tok"),
        col("__tf").as("tf"), col("__dl").as("dl"),
        bucketOf(col("__tok"), buckets).as("bucket"))
    postings.repartition(buckets, col("bucket"))
      .write.mode("append").partitionBy("bucket").parquet(s"$dir/postings")
  }

  /** BM25 top-`k` per probe answered FROM the index. Probe terms come
    * from the probe documents themselves (the "query is a document"
    * contract shared with [[TextAnalysis.bm25TopK]]); everything read
    * from the index is bucket-pruned to the probe terms' buckets.
    * Ranking is hash-identical to the from-scratch bm25TopK.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String, dir: String,
      probeIds: Seq[Long], k: Int = 5, buckets: Int = DefaultBuckets): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    val qterms = termFreqs(docs.filter(col(idCol).isin(probeIds: _*)), idCol, textCol)
      .select(col(idCol).as("probe_id"), col("__tok"))

    // ≤ `buckets` distinct values by construction — a constant-bounded
    // driver-side collect, independent of corpus or probe size.
    val probeBuckets = qterms.select(bucketOf(col("__tok"), buckets).as("bucket"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val postings = spark.read.parquet(s"$dir/postings")
      .filter(col("bucket").isin(probeBuckets: _*))

    // scalar aggregate over the 1-row stats file: a structural row
    // bound the plan audit can SEE (a bare file scan is unbounded to
    // it), and robust if a stats version ever carries multiple rows
    val stats = readLatest(spark, dir, "stats")
      .agg(sum(col("n")).as("n"), sum(col("sumdl")).as("sumdl"))
      .select(col("n"), expr("100L * sumdl div n").as("__avgdl_fp"))
    val idf = readLatest(spark, dir, "vocab").crossJoin(broadcast(stats))
      .select(col("tok"),
        expr("(2L * n - 2L * df + 1L) * 1000L div (2L * df + 1L)").as("__idf_fp"))
    val sat = postings.crossJoin(broadcast(stats))
      .select(col("doc_id"), col("tok"),
        expr("22L * tf * __avgdl_fp * 10000L div " +
          "(10L * tf * __avgdl_fp + 3L * __avgdl_fp + 900L * dl)").as("__sat_fp"))
    val scored = sat
      .join(broadcast(qterms.withColumnRenamed("__tok", "tok")), Seq("tok"))
      .filter(col("doc_id") =!= col("probe_id"))
      .join(broadcast(idf.join(qterms.select(col("__tok").as("tok")).distinct(), Seq("tok"))),
        Seq("tok"))
      .groupBy(col("probe_id"), col("doc_id"))
      .agg(sum(col("__idf_fp") * col("__sat_fp")).as("__score_fp"))
    val rank = Window.partitionBy(col("probe_id"))
      .orderBy(col("__score_fp").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(rank))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("doc_id").as(idCol),
        (col("__score_fp").cast("double") / 1.0e7).as("score"))
  }
}
