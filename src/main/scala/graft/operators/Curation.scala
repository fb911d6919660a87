package graft.operators

import graft.functions.TextFunctions
import graft.plans.TextVectorExpressions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a large-scale training-data pipeline runs
  * between ingestion and tokenization: deterministic stratified
  * sampling (data mixing), quality-aware dedup survivor selection,
  * benchmark decontamination, and vocabulary statistics.
  *
  * Scale rules shared by the family: sampling is a pure scan-side
  * filter (no shuffle, no RNG state); survivor selection is one hash
  * aggregation; decontamination broadcasts the (small) benchmark
  * shingle set against the corpus so the corpus never shuffles.
  */
object Curation {

  /** Hex-prefix threshold for a deterministic keep-fraction: a row is
    * kept iff the first 4 hex chars of md5(id) compare below the
    * threshold string. md5 is identical across engines, and the
    * comparison is plain string ordering — so the SAMPLE ITSELF is
    * reproducible anywhere (unlike RNG-based sampling, which depends on
    * partitioning), with fraction granularity 1/65536.
    */
  def hexThreshold(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0)
    val v = math.round(fraction * 65536).toInt
    // fraction 1.0 must exceed every 4-char hex bucket; "g" sorts after
    // all hex digits while staying a plain-string comparison
    if (v >= 65536) "g" else f"$v%04x"
  }

  /** Deterministic stratified sample: per-stratum keep fractions (data
    * mixing weights), `defaultFraction` for unlisted strata. Pure
    * filter — pushdown-friendly, shuffle-free, identical at any
    * parallelism.
    */
  def stratifiedSample(
      df: DataFrame, idCol: String, strataCol: String,
      fractions: Map[String, Double], defaultFraction: Double
  ): DataFrame = {
    val bucket = substring(md5(col(idCol).cast("string")), 1, 4)
    val threshold = fractions.foldLeft(lit(hexThreshold(defaultFraction))) {
      case (acc, (stratum, frac)) => when(col(strataCol) === stratum, lit(hexThreshold(frac))).otherwise(acc)
    }
    df.filter(bucket < threshold)
  }

  /** Repeat-aware mixture materialization — the UPSAMPLING half of data
    * mixing (the published LM data recipes state per-source epoch
    * counts like "books × 2.5"; [[temperatureSample]] and
    * [[stratifiedSample]] only go DOWN). A source with weight w
    * contributes floor(w) full copies (epochs 0..floor(w)−1) plus a
    * deterministic frac(w)-sample as the final partial epoch, chosen by
    * the same md5 hex-prefix coin as [[stratifiedSample]] — so the
    * partial epoch is a fixed, reproducible SUBSET, not a random draw,
    * and re-runs/engines agree row-for-row.
    *
    * Scale shape: a projection + explode over a broadcast weight table —
    * no shuffle, no driver materialization; output volume is exactly
    * Σ_s w_s·n_s rows, the number the training run budgeted. The salt
    * gives an independent partial-epoch selection per experiment.
    */
  def epochMix(
      df: DataFrame, idCol: String, strataCol: String,
      weights: Map[String, Double], defaultWeight: Double = 1.0, salt: String = ""
  ): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(_ >= 0.0),
      "mixture weights must be non-negative")
    val weight = weights.foldLeft(lit(defaultWeight)) {
      case (acc, (stratum, w)) => when(col(strataCol) === stratum, lit(w)).otherwise(acc)
    }
    val full   = floor(weight).cast("int")
    val bucket = substring(md5(concat(col(idCol).cast("string"), lit(salt))), 1, 4)
    // hexThreshold in column form: frac(w) ∈ [0,1) always < 1, so the
    // "g" sentinel is never needed here
    val thresh = format_string("%04x", round((weight - full) * 65536).cast("int"))
    val epochs = when(bucket < thresh, full + 1).otherwise(full)
    // guard: sequence(0, -1) is a DESCENDING two-element range in Spark,
    // not empty — weight-0 strata must vanish via an empty array
    df.withColumn("epoch", explode(
        when(epochs > 0, sequence(lit(0), epochs - 1))
          .otherwise(array().cast("array<int>"))))
  }

  /** Deterministic train/val/test split manifest: every row gets a
    * split label from the same md5 hex-prefix coin as
    * [[stratifiedSample]], compared against CUMULATIVE fraction
    * thresholds in declaration order (first match wins, the final split
    * absorbs the remainder so labels always partition the corpus). A
    * pure per-row projection — shuffle-free, reproducible across
    * engines/cluster sizes, and `salt` yields an independent assignment
    * per experiment without touching the data. Mutually-exclusive,
    * jointly-exhaustive by construction — the properties a sampling
    * filter cannot give you when train AND eval must come from one
    * pass.
    */
  def assignSplits(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)], salt: String = ""): DataFrame =
    assignSplitsByKey(df, col(idCol).cast("string"), splits, salt)

  /** [[assignSplits]] over an arbitrary KEY expression — the leakage-safe
    * variant: keyed on a content hash (or a dup-cluster id), every copy
    * of a duplicated document flips the SAME coin and lands in the same
    * split, so train can never leak an exact copy of a test document.
    * Still a pure per-row projection: the key is computed inline, no
    * grouping, no shuffle — group integrity comes from coin determinism,
    * not from co-locating the group.
    */
  def assignSplitsByKey(df: DataFrame, key: Column,
      splits: Seq[(String, Double)], salt: String = ""): DataFrame = {
    require(splits.nonEmpty, "at least one split required")
    require(splits.map(_._2).forall(_ > 0.0), "split fractions must be positive")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    val coin = substring(md5(concat(key, lit(salt))), 1, 4)
    val cumulative = splits.scanLeft(0.0)(_ + _._2).tail
    val assigned = splits.zip(cumulative).init.reverse
      .foldLeft(lit(splits.last._1)) { case (acc, ((name, _), cum)) =>
        when(coin < lit(hexThreshold(cum)), lit(name)).otherwise(acc)
      }
    df.withColumn("split", assigned)
  }

  /** Token-budget mixing manifest: per-stratum token totals and the
    * keep-weight `min(1, budget / tokens)` that caps every stratum at
    * `budgetTokens` for the next sampling pass (the DoReMi/Pile-style
    * "domain weights" table). ONE aggregation over the corpus — the
    * manifest is dimension-table-sized and broadcasts into whatever
    * sampler consumes it ([[stratifiedSample]] takes it as its
    * fractions map). Weight math stays in one IEEE double division so
    * the manifest is engine-exact.
    */
  def mixingManifest(docs: DataFrame, strataCol: String, textCol: String,
      budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    docs.groupBy(col(strataCol))
      .agg(
        sum(size(TextFunctions.tokens(col(textCol)))).as("n_tokens"),
        count(lit(1)).as("n_docs"))
      .withColumn("weight", least(lit(1.0), lit(budgetTokens.toDouble) / col("n_tokens")))
  }

  /** Exact dedup keeping the BEST row per duplicate cluster rather than
    * the smallest id: one hash aggregation with
    * `max_by(row, (quality, -id))` — quality decides, smallest id
    * breaks ties deterministically.
    */
  def keepBestPerCluster(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val scored = TextAnalysis.qualityScore(docs, idCol, textCol)
      .select(col(idCol), col("quality_score"))
    val withKey = docs.join(scored, Seq(idCol))
      .withColumn("content_hash", md5(col(textCol)))
    val payload = struct(withKey.columns.map(col).toIndexedSeq: _*)
    val ord     = struct(col("quality_score"), -col(idCol))
    withKey.groupBy(col("content_hash"))
      .agg(max_by(payload, ord).as("__row"), count(lit(1)).as("n_copies"))
      .select(col("__row.*"), col("n_copies"))
  }

  /** Benchmark decontamination: flag corpus docs sharing ANY word
    * n-gram with a benchmark document. The benchmark's distinct shingle
    * hashes are the (small) broadcast side; the corpus is scanned once,
    * its exploded shingles semi-joined against the broadcast set — no
    * shuffle of the corpus, cost O(corpus shingles).
    */
  def contaminatedDocs(
      corpus: DataFrame, benchmark: DataFrame, idCol: String, textCol: String, shingleN: Int
  ): DataFrame = {
    val benchShingles = benchmark
      .select(explode(TextVectorExpressions.shingleHashes(col(textCol), shingleN)).as("__sh"))
      .distinct()
    corpus
      .select(col(idCol), explode(TextVectorExpressions.shingleHashes(col(textCol), shingleN)).as("__sh"))
      .join(broadcast(benchShingles), Seq("__sh"), "left_semi")
      .select(col(idCol))
      .distinct()
  }

  /** Bloom-filter decontamination — the 100 TB form of
    * [[contaminatedDocs]]. The exact variant broadcasts every distinct
    * benchmark shingle hash; here the benchmark side is folded into a
    * Bloom sketch (~1.2 bytes/element at 1% fpp vs 8+ for the hash set),
    * and the corpus-side membership test runs as a codegen'd expression
    * — no join at all, one corpus scan. One-sided error: the result is a
    * SUPERSET of the exact answer (false positives possible, false
    * negatives impossible), which is the safe direction for
    * decontamination; chase the flagged sliver through
    * [[contaminatedDocs]] when exact precision is required.
    */
  def contaminatedDocsBloom(
      corpus: DataFrame, benchmark: DataFrame, idCol: String, textCol: String,
      shingleN: Int, fpp: Double = 0.01
  ): DataFrame = {
    val benchShingles = benchmark
      .select(explode(TextVectorExpressions.shingleHashes(col(textCol), shingleN)).as("__sh"))
      .distinct()
    // benchmark suites are small by contract (same contract the exact
    // variant's broadcast relies on): size the sketch from the true
    // distinct count, one cheap action over the small side
    val expected = math.max(1L, benchShingles.count())
    val bloom    = benchShingles.stat.bloomFilter("__sh", expected, fpp)
    corpus
      .select(col(idCol), explode(TextVectorExpressions.shingleHashes(col(textCol), shingleN)).as("__sh"))
      .filter(graft.plans.BloomExpressions.mightContainLong(col("__sh"), bloom))
      .select(col(idCol))
      .distinct()
  }

  /** Sequence packing: shard documents (in id order) into contiguous
    * token-budget groups — the step between token counting and batch
    * assembly in a training pipeline. `seq_id = exclusive-prefix-tokens
    * div budget`, computed with the same two-phase scheme as row-count
    * staging, but weighted: range partition by id, per-partition
    * token-cumsums in parallel, per-partition token TOTALS (driver-side
    * O(partitions) metadata) become broadcast offsets. No global window,
    * no single-partition stage, identical result at any parallelism.
    */
  /** Per-document sequence assignment — the two-phase numbering that
    * [[packSequences]] aggregates. Returns `(idCol, n_tokens, seq_id)`.
    */
  def packAssignments(docs: DataFrame, idCol: String, textCol: String, tokenBudget: Long): DataFrame = {
    val spark = docs.sparkSession
    val local = docs
      .select(col(idCol).as("__id"),
        size(TextFunctions.tokens(col(textCol))).cast("long").as("__tok"))
      .repartitionByRange(col("__id"))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__cum",
        sum(col("__tok")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("__pid").orderBy("__id")))
      .localCheckpoint()
    val totals = local.groupBy("__pid").agg(sum(col("__tok")).as("__t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (pid, t) => val off = acc; acc += t; (pid, off) }.toSeq
    val offDf = spark.createDataFrame(offsets).toDF("__pid", "__off")
    local
      .join(broadcast(offDf), Seq("__pid"))
      // exclusive prefix: tokens BEFORE this doc decide its sequence
      .withColumn("seq_id", ((col("__off") + col("__cum") - col("__tok")) / tokenBudget).cast("long"))
      .select(col("__id").as(idCol), col("__tok").as("n_tokens"), col("seq_id"))
  }

  def packSequences(docs: DataFrame, idCol: String, textCol: String, tokenBudget: Long): DataFrame = {
    packAssignments(docs, idCol, textCol, tokenBudget)
      .select(col(idCol).as("__id"), col("n_tokens").as("__tok"), col("seq_id"))
      .groupBy("seq_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__tok")).as("n_tokens"),
        min(col("__id")).as("first_doc"),
        max(col("__id")).as("last_doc")
      )
      .orderBy("seq_id")
  }

  /** Corpus vocabulary: top-k tokens by document-independent frequency.
    * Explode + two-phase count aggregation (map-side partial combine on
    * each task's tokens), then a bounded top-k — the standard
    * vocabulary-building shape at any corpus size.
    */
  /** Deterministic global shuffle for training-order randomization.
    * At 100 TB "shuffle the corpus" cannot be an in-memory permutation;
    * the scalable form is a sort by a cryptographic hash of the row key:
    * range-partitioned by sampled hash bounds, each partition sorts
    * locally, output order is fully reproducible across runs/engines
    * (same md5 on both sides of the oracle) and statistically
    * indistinguishable from uniform. Changing `salt` yields an
    * independent permutation per epoch without touching the data.
    */
  def deterministicShuffle(df: DataFrame, keyCols: Seq[String], salt: String): DataFrame = {
    // Each key part is LENGTH-PREFIXED (`len:value`) before hashing: a
    // plain '|' join is ambiguous for string keys containing the
    // separator (("a|b","c") and ("a","b|c") would collide to one
    // shuffle_key, breaking the independent-permutation claim). The
    // prefix-free encoding is a few string built-ins — still codegen'd,
    // and expressible verbatim in the DuckDB oracle.
    val parts = keyCols.flatMap { k =>
      val s = col(k).cast("string")
      Seq(length(s).cast("string"), lit(":"), s)
    }
    val key = md5(concat((parts :+ lit("|" + salt)): _*))
    df.withColumn("shuffle_key", key).orderBy("shuffle_key")
  }

  /** Collocation (phrase) mining: top-k adjacent token pairs ranked by
    * a PMI-proportional score — the tokenizer-building step that finds
    * "new york"-style units worth fusing before BPE training.
    *
    * score(x,y) = c(xy)·N / (c(x)·c(y)) with all margins taken over the
    * bigram multiset (c(x)=Σ_y c(xy), N=Σ c(xy)) — monotone in PMI
    * (log of it), so the ranking is identical without ever calling a
    * libm log (which differs across runtimes in the last ulp). Counts
    * are exact longs; the products widen through decimal(38,0) (c·N
    * overflows int64 past ~10¹² tokens) and take ONE correctly-rounded
    * cast each before the single IEEE division — engine-exact, same
    * discipline as Analyze.corrMatrix.
    *
    * Shape: one corpus pass explodes adjacent pairs (map-side combine
    * into the observed-bigram-bounded count table); margins are two
    * vocabulary-bounded aggregations broadcast back; top-k is a
    * TakeOrdered. No shuffle carries more than the bigram vocabulary.
    */
  def collocations(docs: DataFrame, textCol: String, minCount: Long, k: Int): DataFrame = {
    val pairs = docs
      .select(TextFunctions.tokens(col(textCol)).as("__t"))
      .filter(size(col("__t")) >= 2)
      .select(explode(expr(
        "zip_with(slice(__t, 1, size(__t)-1), slice(__t, 2, size(__t)-1), " +
          "(a, b) -> named_struct('x', a, 'y', b))")).as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"))
    val counts = pairs.groupBy("x", "y").agg(count(lit(1)).as("c_xy"))
    val cx  = counts.groupBy("x").agg(sum("c_xy").as("c_x"))
    val cy  = counts.groupBy("y").agg(sum("c_xy").as("c_y"))
    val tot = counts.agg(sum("c_xy").as("__n_total"))
    def d38(c: Column) = c.cast("decimal(38,0)")
    // marginal-count sides are VOCABULARY-scaled (sub-linear in corpus
    // but unbounded — a 100 TB crawl's token set runs to billions):
    // hint only when measured small, shuffle via AQE beyond
    counts.filter(col("c_xy") >= minCount)
      .join(ScaleSafe.broadcastIfSmall(cx), Seq("x"))
      .join(ScaleSafe.broadcastIfSmall(cy), Seq("y"))
      .crossJoin(broadcast(tot))
      .withColumn("pmi_ratio",
        (d38(col("c_xy")) * d38(col("__n_total"))).cast("double") /
          (d38(col("c_x")) * d38(col("c_y"))).cast("double"))
      .select("x", "y", "c_xy", "c_x", "c_y", "pmi_ratio")
      .orderBy(col("pmi_ratio").desc, col("x"), col("y"))
      .limit(k)
  }

  def vocabTopK(docs: DataFrame, textCol: String, k: Int): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)

  /** Temperature-based domain rebalancing — the multilingual-LM data
    * mixing scheme (sqrt/temperature sampling): stratum `s` with share
    * `p_s` is downsampled to `keep_frac = (min_n / n_s)^(1-alpha)`, so
    * the smallest stratum keeps everything and dominant strata shrink
    * toward a flatter mix (alpha=1 keeps the natural mix, alpha=0
    * equalizes counts). The per-row keep decision reuses the
    * deterministic md5-prefix coin of [[stratifiedSample]].
    *
    * alpha=0.5 routes through `sqrt`, which IEEE requires to be
    * correctly rounded — the keep fractions (hence the sampled SET) are
    * engine-exact, where a `pow`-computed fraction could differ in the
    * last ulp between libms.
    *
    * Scale shape: stratum counts are one tiny aggregate broadcast back;
    * the corpus itself never shuffles — the sample is a pure filter
    * behind a broadcast join, identical at any parallelism.
    */
  def temperatureSample(
      df: DataFrame, idCol: String, strataCol: String, alpha: Double = 0.5
  ): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0, 1], got $alpha")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("n_stratum"))
    val minN   = counts.agg(min(col("n_stratum")).as("__min_n"))
    val ratio  = col("__min_n").cast("double") / col("n_stratum")
    val frac   =
      if (alpha == 0.5) sqrt(ratio)
      else if (alpha == 1.0) lit(1.0)
      else pow(ratio, 1.0 - alpha)
    val fracs = counts.crossJoin(broadcast(minN))
      .select(col(strataCol), col("n_stratum"), frac.as("keep_frac"))
    val bucket = substring(md5(col(idCol).cast("string")), 1, 4)
    df.join(broadcast(fracs), Seq(strataCol))
      .filter(col("keep_frac") >= 1.0 ||
        bucket < format_string("%04x", floor(col("keep_frac") * 65536).cast("int")))
      .select(col(idCol), col(strataCol), col("n_stratum"), col("keep_frac"))
  }

  /** Corpus-relative length-outlier detection: rows whose length column
    * falls outside the corpus [lo, hi] percentile band (truncated heads,
    * concatenation blowups, scraper failures). The two quantiles come
    * from ONE aggregate broadcast back over the corpus — a pure filter
    * pass, no sort of the data. At 100 TB the same shape ships with
    * approx_percentile (t-digest, mergeable) in place of the exact
    * percentile the oracle gate requires.
    */
  def lengthOutliers(
      docs: DataFrame, idCol: String, lenCol: String,
      lo: Double = 0.05, hi: Double = 0.95
  ): DataFrame = {
    val bounds = docs.agg(
      expr(s"percentile($lenCol, $lo)").as("lo_bound"),
      expr(s"percentile($lenCol, $hi)").as("hi_bound"))
    docs.crossJoin(broadcast(bounds))
      .filter(col(lenCol) < col("lo_bound") || col(lenCol) > col("hi_bound"))
      .select(col(idCol), col(lenCol), col("lo_bound"), col("hi_bound"))
  }

  /** Per-domain cap (C4/RefinedWeb-style): keep at most `k` rows per
    * domain, best-first by `(orderCol DESC, id ASC)` — a total order, so
    * the kept SET is deterministic and engine-exact.
    *
    * Skew is the 100 TB concern here (a crawl is routinely 10-40% one
    * host), and the declarative rank-filter is already the skew-safe
    * plan: Catalyst's InferWindowGroupLimit rewrites
    * `filter(row_number <= k)` into a PARTIAL WindowGroupLimit before
    * the exchange — every map task forwards at most k rows per domain,
    * exactly like map-side combine — plus a Final one after, so a
    * mega-domain contributes ≤ k·mapPartitions rows to its reducer
    * instead of its full row count. Hand-rolled two-phase salting (rank
    * within (domain, salt), then re-rank survivors) computes the same
    * set with one MORE exchange; CurationSpec pins the Partial node so
    * a regression to the unbounded plan fails the suite.
    */
  def domainTopK(
      docs: DataFrame, idCol: String, domainCol: String, orderCol: String, k: Int
  ): DataFrame = {
    require(k > 0)
    val w = Window.partitionBy(col(domainCol)).orderBy(col(orderCol).desc, col(idCol).asc)
    docs
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= k)
      .drop("__r")
  }

  /** Split documents into fixed-width training windows: token windows of
    * `chunkTokens`, starting every `strideTokens` (overlap =
    * chunkTokens - strideTokens), the context-window prep step between
    * curation and tokenization. Pure narrow transformation — tokenize,
    * generate starts, explode, slice — no shuffle anywhere, so it scales
    * with the scan and never moves data.
    */
  def chunkDocuments(
      docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, strideTokens: Int
  ): DataFrame = {
    require(chunkTokens > 0 && strideTokens > 0 && strideTokens <= chunkTokens)
    val toks = TextFunctions.tokens(col(textCol))
    docs
      .withColumn("__toks", toks)
      .withColumn("__start",
        explode(sequence(lit(0), greatest(size(col("__toks")) - 1, lit(0)), lit(strideTokens))))
      .select(
        col(idCol),
        (col("__start") / strideTokens).cast("long").as("chunk_id"),
        least(lit(chunkTokens), size(col("__toks")) - col("__start")).cast("long").as("n_tokens"),
        array_join(slice(col("__toks"), col("__start") + 1, lit(chunkTokens)), " ").as("chunk_text"))
  }

  /** Exact-k deterministic sample per group: the k rows of each group
    * with the smallest md5 coin (id + salt), ranked. Complements
    * [[stratifiedSample]] (keep-FRACTION, size drifts with the stratum)
    * when the mixing recipe demands an exact per-source count.
    *
    * Two-phase for scale: a single `row_number over (partition by
    * group)` puts an entire group in one task — a hot source at 100 TB
    * is a straggler or an OOM. Phase 1 ranks within (group, id-hash
    * bucket) and keeps k per bucket, so phase 2's per-group input is
    * ≤ buckets·k rows REGARDLESS of group size. Result is identical to
    * the one-window form: every global top-k row is also in its own
    * bucket's top-k, and phase 2 re-ranks survivors in the same total
    * order (coin, id). Same salt ⇒ same manifest on any engine or
    * cluster size; a new salt ⇒ an independent resample.
    */
  def exactKPerGroup(
      df: DataFrame, idCol: String, groupCol: String, k: Int,
      salt: String = "", buckets: Int = 64
  ): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val coin = md5(concat(col(idCol).cast("string"), lit("|" + salt)))
    val w1 = Window.partitionBy(col(groupCol), col("__b")).orderBy(col("__coin"), col(idCol))
    val w2 = Window.partitionBy(col(groupCol)).orderBy(col("__coin"), col(idCol))
    df.select(col(groupCol), col(idCol))
      .withColumn("__coin", coin)
      .withColumn("__b", pmod(hash(col(idCol)), lit(buckets)))
      .withColumn("__rn1", row_number().over(w1)).where(col("__rn1") <= k)
      .withColumn("rn", row_number().over(w2).cast("long")).where(col("rn") <= k)
      .select(col(groupCol), col(idCol), col("rn"))
  }

  /** Cross-source n-gram overlap matrix: for every source pair, the
    * number of DISTINCT word n-grams occurring in both — the
    * contamination/leakage signal between crawl snapshots or vendor
    * feeds (exact-hash overlap misses near-copies; shared-shingle mass
    * does not). Distinct (source, gram) first, then an equi-self-join
    * on the gram: per-gram fanout is bounded by #sources², never by
    * document count, so the matrix stays cheap at any corpus size.
    */
  /** Per-source vocabulary growth curve (the Heaps-law diagnostic): for
    * each doc position in id order, how many NEVER-SEEN-BEFORE tokens
    * it contributes and the running vocabulary size. A healthy crawl
    * grows sublinearly; a curve that keeps climbing linearly means
    * boilerplate-free novel text (or an id-ordering bug), one that
    * flatlines early means the source is exhausted/duplicated — the
    * signal that decides whether another epoch of a source is worth
    * mixing in.
    *
    * Scale shape: "first occurrence" is `min(doc_id) per (source,
    * token)` — one vocab-bounded aggregation, no sort of the corpus;
    * the growth curve is a window over the doc-count-sized per-doc
    * frame, PARTITIONED BY SOURCE (never a global single-partition
    * window), so each source's curve sorts independently.
    */
  def vocabGrowth(df: DataFrame, srcCol: String, idCol: String, textCol: String): DataFrame =
    vocabGrowthFromFirsts(vocabFirsts(df, srcCol, idCol, textCol), srcCol, idCol)

  /** The persistable artifact behind [[vocabGrowth]]: one row per
    * (source, token) with the id of the first document containing it.
    * `min` is associative and commutative, so the index is MERGEABLE:
    * folding a new ingest's firsts into the stored index
    * ([[vocabFirstsMerge]]) is one vocab-sized aggregation and equals
    * the from-scratch rebuild exactly — the corpus is never rescanned.
    */
  def vocabFirsts(df: DataFrame, srcCol: String, idCol: String, textCol: String): DataFrame =
    df.select(col(srcCol), col(idCol),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col(srcCol), col("token"))
      .agg(min(col(idCol)).as(idCol))

  def vocabFirstsMerge(index: DataFrame, deltaFirsts: DataFrame): DataFrame = {
    val cols = index.columns
    index.unionByName(deltaFirsts)
      .groupBy(cols.dropRight(1).map(col): _*)
      .agg(min(col(cols.last)).as(cols.last))
  }

  def vocabGrowthFromFirsts(firsts: DataFrame, srcCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perDoc = firsts.groupBy(col(srcCol), col(idCol))
      .agg(count(lit(1)).as("n_new"))
    val w = Window.partitionBy(col(srcCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perDoc.withColumn("vocab_size", sum(col("n_new")).over(w))
  }

  def sourceNgramOverlap(df: DataFrame, srcCol: String, textCol: String, n: Int): DataFrame = {
    val sg = df.select(col(srcCol).as("__src"),
        explode(TextFunctions.wordShingles(col(textCol), n)).as("__gram"))
      .distinct()
    sg.as("a").join(sg.as("b"),
        col("a.__gram") === col("b.__gram") && col("a.__src") < col("b.__src"))
      .groupBy(col("a.__src").as("source_a"), col("b.__src").as("source_b"))
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  /** Integer-exact per-doc quality + token mass from ONE TextProfile
    * pass: quality_fp = (1000·alpha_chars) div n_chars in [0,1000]
    * (0 for empty text). The integer form is what makes band-based
    * selection ([[selectByBudget]]) engine-exact: a float score puts
    * docs ON the selection boundary at the mercy of the last ulp.
    */
  def docQualityTokens(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val c = col("__c")
    docs.withColumn("__c", TextVectorExpressions.textProfile(col(textCol), Nil))
      .select(col(idCol),
        when(c.getItem(2) === 0L, 0L)
          .otherwise(expr("1000L * __c[3] div __c[2]")).as("quality_fp"),
        c.getItem(0).as("n_tokens"))
  }

  /** Token-budget quality selection (the FineWeb-Edu shape: keep the
    * best documents until the token budget is spent). Contract: order
    * docs by (quality_fp DESC, id ASC) and keep the maximal prefix
    * whose cumulative token count stays ≤ budget.
    *
    * The naive formulation is a running sum over a GLOBAL sort — a
    * single-partition window that dies at 100 TB. This is the two-phase
    * equivalent, proven identical row-for-row:
    *   1. aggregate token mass per quality band (≤1001 rows — the
    *      integer score IS the band key);
    *   2. cumulative-sum the BAND table (a window over ≤1001 rows) to
    *      find each band's exclusive prefix mass;
    *   3. bands that fit entirely keep all docs with no per-doc work;
    *      only the ONE boundary band runs a per-doc running sum, and
    *      that window is PARTITIONED by the band key — never global.
    */
  def selectByBudget(docs: DataFrame, idCol: String, textCol: String,
      budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 0, s"budgetTokens must be non-negative, got $budgetTokens")
    val d = docQualityTokens(docs, idCol, textCol)
    val bands = d.groupBy(col("quality_fp"))
      .agg(sum(col("n_tokens")).as("__band_tokens"))
    val bw = Window.orderBy(col("quality_fp").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val banded = bands.withColumn("__cum_before", coalesce(sum(col("__band_tokens")).over(bw), lit(0L)))
    val joined = d.join(broadcast(banded), Seq("quality_fp"))
    val fullyIn = joined.filter(col("__cum_before") + col("__band_tokens") <= budgetTokens)
    val boundary = joined
      .filter(col("__cum_before") + col("__band_tokens") > budgetTokens &&
        col("__cum_before") < budgetTokens)
    val dw = Window.partitionBy(col("quality_fp")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundaryIn = boundary
      .withColumn("__cum", col("__cum_before") + sum(col("n_tokens")).over(dw))
      .filter(col("__cum") <= budgetTokens)
    fullyIn.select(col(idCol), col("quality_fp"), col("n_tokens"))
      .unionAll(boundaryIn.select(col(idCol), col("quality_fp"), col("n_tokens")))
  }

  /** Histogram-based sequence packing (the padding-efficiency packer of
    * arXiv:2107.02027, best-fit-decreasing over the LENGTH HISTOGRAM):
    * where [[packAssignments]] shards docs in arrival order (simple, one
    * boundary doc per pack crosses the budget), this packs docs of
    * mixed lengths into fixed-budget packs minimizing padding — the
    * form LLM pretraining actually wants, because every pack pads to
    * the model's sequence length and padding is wasted compute.
    *
    * Scale contract: the driver only ever sees the length HISTOGRAM
    * (≤ budget rows) and the derived pack STRATEGIES (distinct
    * length-multiset compositions with multiplicities) — never a
    * per-doc or per-pack structure. Concrete doc→pack assignment is
    * distributed: docs rank within their length (one window), and a
    * broadcast (length, strategy) table maps rank → pack id by pure
    * integer arithmetic. Deterministic at any parallelism.
    *
    * Docs longer than the budget each get a pack of their own (flagged
    * by `oversize`); empty docs count one token (their empty-string
    * token) — callers filter first if they want them gone.
    */
  def packHistogram(docs: DataFrame, idCol: String, textCol: String,
      tokenBudget: Long): DataFrame = {
    require(tokenBudget >= 1 && tokenBudget <= 65536,
      s"tokenBudget must be in [1, 65536] (driver state is O(budget)), got $tokenBudget")
    val spark = docs.sparkSession
    val lengths = docs.select(col(idCol),
      greatest(size(TextFunctions.tokens(col(textCol))), lit(1)).cast("long").as("__len"))

    // 1. bounded histogram to the driver (oversize handled separately)
    val hist = lengths.filter(col("__len") <= tokenBudget)
      .groupBy("__len").agg(count(lit(1)).as("__c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(-_._1)

    // 2. best-fit-decreasing over capacity buckets; identical pack
    //    compositions merge into one STRATEGY with a multiplicity.
    //    Open buckets live in a TreeMap keyed by (remaining, creationId):
    //    best fit = first key >= (len, MIN) — smallest remaining that
    //    still fits, earliest-created on ties — O(log n) per placement
    //    instead of the previous O(n) scan+sort (which also aliased
    //    structurally-equal buckets through indexOf).
    final case class OpenBucket(id: Long, var remaining: Long,
        comp: scala.collection.mutable.ArrayBuffer[(Long, Long)], var m: Long)
    val open    = scala.collection.mutable.TreeMap.empty[(Long, Long), OpenBucket]
    val created = scala.collection.mutable.ArrayBuffer.empty[OpenBucket]
    var nextId  = 0L
    def newBucket(remaining: Long, comp: scala.collection.mutable.ArrayBuffer[(Long, Long)], m: Long): OpenBucket = {
      val b = OpenBucket(nextId, remaining, comp, m); nextId += 1
      open((b.remaining, b.id)) = b; created += b; b
    }
    for ((len, total) <- hist) {
      var left = total
      while (left > 0) {
        open.iteratorFrom((len, Long.MinValue)).buffered.headOption match {
          case Some((key, b)) =>
            val take = math.min(left, b.m)
            if (take == b.m) {
              open.remove(key)
              b.comp += ((len, 1L)); b.remaining -= len
              open((b.remaining, b.id)) = b
            } else {
              // split the bucket: `take` instances receive this doc
              b.m -= take // remaining unchanged — key stays valid
              newBucket(b.remaining - len, b.comp.clone() += ((len, 1L)), take)
            }
            left -= take
          case None =>
            newBucket(tokenBudget - len,
              scala.collection.mutable.ArrayBuffer((len, 1L)), left)
            left = 0
        }
      }
    }
    // strategies in creation order; per strategy: docs-of-length-L per
    // instance (k) and instance multiplicity (m)
    val strategies = created.toSeq
    val packBase = strategies.scanLeft(0L)(_ + _.m)

    // 3. broadcast (len, strategy) slot-range table: for each length,
    //    cumulative rank ranges across strategies in order
    val slotRows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long)]
    val cumByLen = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for ((s, si) <- strategies.zipWithIndex) {
      val perInstance = s.comp.groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).sum }
      for ((l, k) <- perInstance.toSeq.sortBy(_._1)) {
        val start = cumByLen(l)
        slotRows += ((l, start, start + s.m * k, k, packBase(si)))
        cumByLen(l) = start + s.m * k
      }
    }
    import spark.implicits._
    val slots = slotRows.toSeq.toDF("__len", "__lo", "__hi", "__k", "__base")

    val w = Window.partitionBy(col("__len")).orderBy(col(idCol))
    val ranked = lengths.filter(col("__len") <= tokenBudget)
      .withColumn("__r", row_number().over(w).cast("long") - 1L)
    val packed = ranked.join(broadcast(slots),
        ranked("__len") === slots("__len") &&
          col("__r") >= col("__lo") && col("__r") < col("__hi"))
      .select(col(idCol), ranked("__len").as("n_tokens"),
        (col("__base") + expr("(__r - __lo) div __k")).cast("long").as("pack_id"),
        lit(false).as("oversize"))

    // oversize docs: one pack each, ids after all strategy packs.
    // Numbered with the two-phase scheme (Staging.withGlobalRank) — an
    // unpartitioned window funnels every oversize doc through ONE
    // partition, fine while they're rare, a single-executor sort the
    // day a corpus's docs routinely exceed tokenBudget (VERDICT r14)
    val totalPacks = packBase.last
    val oversize = Staging.withGlobalRank(
        lengths.filter(col("__len") > tokenBudget), idCol, "__r")
      .select(col(idCol), col("__len").as("n_tokens"),
        (lit(totalPacks) + col("__r")).as("pack_id"), lit(true).as("oversize"))
    packed.unionByName(oversize)
  }

  /** DSIR-style importance weights over hashed bigram features (Xie et
    * al., "Data Selection for Language Models via Importance
    * Resampling", arXiv:2302.03169): score each pool document by how
    * much its hashed-n-gram profile looks like the TARGET corpus
    * relative to the POOL distribution, then select by weight.
    *
    * Feature space: bigrams hashed to 16^hexChars buckets via an
    * md5-hex prefix — the same engine-portable hash the split/sample
    * family uses, so the bucketing (and therefore the score) is
    * bit-reproducible in any engine with md5. Per-feature odds are
    * (target_count+1)/(pool_count+1) — add-one smoothing exactly as in
    * the paper's bag-of-hashed-ngrams model.
    *
    * Arithmetic: the paper's log-importance-weight would put libm in
    * the result (engines disagree in the last ulp — see text_ngram_lm);
    * instead the score is the count-weighted MEAN of the per-feature
    * odds (arithmetic instead of geometric mean — same "looks like the
    * target" ordering signal, division-free until the end). Each term
    * is integer fixed-point: (c·(tc+1)·SCALE) div (rc+1) in long math —
    * exact in every engine; one correctly-rounded double division at
    * the end. Long headroom: a term needs c·(tc+1)·1e9 < 2^63, i.e.
    * doc-level bucket count × (target bucket count+1) < 9.2e9 — at a
    * 4096-bucket space that holds until the TARGET corpus alone carries
    * ~10^9 bigrams per bucket; widen SCALE down or the math to decimal
    * past that.
    *
    * Scale shape: both models are ≤ 16^hexChars rows (bounded by
    * construction — broadcast), the pool is touched by one explode +
    * one (doc, bucket) aggregation, and no join ever shuffles the
    * corpus. Documents with < 2 tokens have no bigrams and drop out.
    */
  def dsirWeights(pool: DataFrame, target: DataFrame, idCol: String, textCol: String,
      hexChars: Int = 3, scale: Long = 1000000000L): DataFrame =
    // batch == incremental with an empty history model: the merge then
    // contributes exactly the pool's own bucket counts
    dsirWeightsIncremental(dsirModel(pool.limit(0), textCol, hexChars),
      dsirModel(target, textCol, hexChars), pool, idCol, textCol, hexChars, scale)

  /** Persisted DSIR bucket model: (bucket, n) hashed-bigram counts for a
    * corpus — the structure an incremental pipeline stores so tomorrow's
    * delta is scored without rescanning 100 TB of history. Bounded by
    * the bucket space (16^hexChars rows) and additive across disjoint
    * corpora: [[mergeDsirModel]] sums per-bucket counts.
    */
  def dsirModel(docs: DataFrame, textCol: String, hexChars: Int = 3): DataFrame = {
    require(hexChars >= 1 && hexChars <= 8, s"hexChars must be in [1, 8], got $hexChars")
    docs.select(explode(TextFunctions.wordShingles(col(textCol), 2)).as("__gram"))
      .select(substring(md5(col("__gram")), 1, hexChars).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
  }

  /** Model union for an append-only corpus: one bucket-bounded
    * aggregation (counts add over disjoint doc sets).
    */
  def mergeDsirModel(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("bucket").agg(sum(col("n")).as("n"))

  /** Incremental DSIR: score only the DELTA batch against PERSISTED
    * bucket models — the pool model merged with the delta's own counts
    * (so the distribution is exactly what a batch run over
    * history ∪ delta would see), the target model as stored. Row-
    * identical to [[dsirWeights]] over the full pool restricted to the
    * delta's ids, at O(delta + bucket space) cost: history text is
    * never touched. Same arithmetic contract as the batch operator.
    */
  def dsirWeightsIncremental(poolModel: DataFrame, targetModel: DataFrame,
      delta: DataFrame, idCol: String, textCol: String,
      hexChars: Int = 3, scale: Long = 1000000000L): DataFrame =
    dsirScoreAgainst(mergeDsirModel(poolModel, dsirModel(delta, textCol, hexChars)),
      targetModel, delta, idCol, textCol, hexChars, scale)

  /** Score docs against FIXED models — no delta merge. This is the
    * streaming-GATE form: models are trained offline and every
    * micro-batch scores against the same distribution, so a document's
    * score does not depend on which batch it arrived in. (The
    * incremental BATCH operator above does merge the delta's counts,
    * because there the contract is row-identity with a full batch run
    * over history ∪ delta.)
    */
  def dsirScoreAgainst(poolModel: DataFrame, targetModel: DataFrame,
      docs: DataFrame, idCol: String, textCol: String,
      hexChars: Int = 3, scale: Long = 1000000000L): DataFrame = {
    require(scale >= 1L, s"scale must be >= 1, got $scale")
    docs.select(col(idCol),
        explode(TextFunctions.wordShingles(col(textCol), 2)).as("__gram"))
      .select(col(idCol), substring(md5(col("__gram")), 1, hexChars).as("bucket"))
      .groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("__c"))
      .join(broadcast(targetModel.select(col("bucket"), col("n").as("__tc"))), Seq("bucket"), "left")
      .join(broadcast(poolModel.select(col("bucket"), col("n").as("__rc"))), Seq("bucket"), "left")
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("n_feats"),
        sum(expr(s"(__c * (coalesce(__tc, 0L) + 1L) * ${scale}L) div (coalesce(__rc, 0L) + 1L)"))
          .as("__fp"))
      .select(col(idCol), col("n_feats"),
        (col("__fp").cast("double") / (col("n_feats") * lit(scale)).cast("double"))
          .as("dsir_score"))
  }

  /** Deterministic importance SELECTION on [[dsirWeights]]: the k
    * highest-scoring pool documents, doc-id tiebreak. A global top-k is
    * a TakeOrderedAndProject (per-partition heaps + one k-row driver
    * merge), never a full sort — the standard way to take the selected
    * slice at any corpus size. (The paper resamples with Gumbel noise;
    * a deterministic top-k keeps the manifest reproducible, which
    * matters more in a production curation pipeline.)
    */
  def dsirSelect(pool: DataFrame, target: DataFrame, idCol: String, textCol: String,
      k: Int, hexChars: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    dsirWeights(pool, target, idCol, textCol, hexChars)
      .orderBy(col("dsir_score").desc, col(idCol))
      .limit(k)
  }
}
