package graft.operators

import graft.functions.TextFunctions
import graft.plans.{GraftExpressions, TextVectorExpressions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MetadataBuilder

/** Document deduplication family.
  *
  * Exact dedup is a single hash aggregation on the content digest.
  * Near-dup detection never materializes the O(n²) pair space: MinHash
  * signatures are banded (LSH) so candidate pairs only arise from shared
  * buckets — O(n·bands + candidates) at any scale — and the exact
  * Jaccard check runs on candidates only. SimHash gives a 64-bit
  * fingerprint split into maxHamming+1 chunks, the pigeonhole buckets
  * for complete hamming-distance ≤ maxHamming search.
  */
object Dedup {

  /** Exact dedup: keep the smallest id per distinct content digest. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val digest = md5(col(textCol))
    df.withColumn("content_hash", digest)
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
  }

  /** MinHash signature: numPerm independent minima over the shingle-hash
    * set, via the native codegen'd MinHashSignature expression
    * (plans/HashExpressions.scala) — one tight pass per row.
    */
  def withMinhashSignature(df: DataFrame, textCol: String, shingleN: Int, numPerm: Int): DataFrame =
    df.withColumn(
      "minhash_sig",
      GraftExpressions.minhashSignature(TextVectorExpressions.shingleHashes(col(textCol), shingleN), numPerm)
    )

  /** LSH banding: one row per (doc, band) with the band's hash; docs
    * sharing any (band_id, band_hash) bucket become candidate pairs.
    * Band hashes come from MinHashBands, which computes the signature and
    * the band mixes in ONE pass — projection collapse cannot re-evaluate
    * the signature per band.
    */
  def lshCandidatePairs(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, bands: Int, rowsPerBand: Int): DataFrame = {
    val banded = docs.select(
      col(idCol).as("__id"),
      posexplode(
        GraftExpressions.minhashBands(TextVectorExpressions.shingleHashes(col(textCol), shingleN), bands, rowsPerBand)
      ).as(Seq("band_id", "band_hash"))
    )
    banded.as("a")
      .join(banded.as("b"), col("a.band_id") === col("b.band_id") &&
        col("a.band_hash") === col("b.band_hash") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .distinct()
  }

  /** Exact word-shingle Jaccard for given pairs (candidates only).
    * Shingle sets are 64-bit hash sets (one-pass ShingleHashes): set
    * sizes — and therefore Jaccard values — equal the string-shingle
    * formulation up to negligible 64-bit collision probability.
    */
  def jaccardForPairs(pairs: DataFrame, docs: DataFrame, idCol: String, textCol: String, shingleN: Int): DataFrame = {
    val sh = docs.select(col(idCol).as("__id"), TextVectorExpressions.shingleHashes(col(textCol), shingleN).as("__sh"))
    pairs
      .join(sh.withColumnRenamed("__sh", "__sh_a"), pairs("id_a") === sh("__id")).drop("__id")
      .join(sh.withColumnRenamed("__sh", "__sh_b"), pairs("id_b") === sh("__id")).drop("__id")
      .withColumn("jaccard",
        TextVectorExpressions.sortedJaccard(col("__sh_a"), col("__sh_b")))
      .select("id_a", "id_b", "jaccard")
  }

  /** All near-dup pairs within a blocking key (e.g. same source):
    * ONE self-join on the key with shingle sets computed before the
    * join — the deterministic-candidate-rule variant of the pipeline
    * (LSH banding replaces the blocking key when none exists).
    */
  def blockedJaccardPairs(
      docs: DataFrame, idCol: String, textCol: String, blockCol: String,
      shingleN: Int, threshold: Double
  ): DataFrame = {
    val sh = docs.select(col(idCol).as("__id"), col(blockCol).as("__blk"),
      TextVectorExpressions.shingleHashes(col(textCol), shingleN).as("__sh"))
      .withColumn("__n", size(col("__sh")))
    // exact size prefilter: J(A,B) >= t implies |A∩B| >= t·|A∪B|, and
    // |A∩B| <= min(|A|,|B|), |A∪B| >= max(|A|,|B|) — so any qualifying
    // pair satisfies min >= t·max. Cheap integer predicate evaluated
    // BEFORE the O(|A|+|B|) merge kernel prunes most of the block².
    sh.as("a").join(sh.as("b"),
        col("a.__blk") === col("b.__blk") && col("a.__id") < col("b.__id"))
      .filter(least(col("a.__n"), col("b.__n")).cast("double") >=
        greatest(col("a.__n"), col("b.__n")) * threshold)
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        TextVectorExpressions.sortedJaccard(col("a.__sh"), col("b.__sh")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Asymmetric n-gram CONTAINMENT pairs: C(A→B) = |sh(A) ∩ sh(B)| /
    * |sh(A)| ≥ threshold. Jaccard structurally under-scores a short doc
    * quoted inside a much longer one (the union is dominated by the
    * container), so subset-duplication — quotes, concatenated shards,
    * boilerplate wrapping — needs this direction-aware score (the
    * standard companion to resemblance since Broder 1997).
    *
    * Same candidate discipline as [[blockedJaccardPairs]]: block join,
    * then the exact size prefilter C ≥ t ⇒ |B| ≥ t·|A| (the
    * intersection can't exceed |B|) prunes BEFORE the O(|A|+|B|) merge
    * kernel. Emits ordered pairs (id_a contained-in id_b); a near-exact
    * dup qualifies in both directions by design. At 100 TB the block
    * column is the MinHash band (the [[bandIndex]] family) instead of a
    * metadata column — the scoring stage is unchanged.
    */
  def containmentPairs(
      docs: DataFrame, idCol: String, textCol: String, blockCol: String,
      shingleN: Int, threshold: Double
  ): DataFrame = {
    val sh = docs.select(col(idCol).as("__id"), col(blockCol).as("__blk"),
      TextVectorExpressions.shingleHashes(col(textCol), shingleN).as("__sh"))
      .withColumn("__n", size(col("__sh")))
    sh.as("a").join(sh.as("b"),
        col("a.__blk") === col("b.__blk") && col("a.__id") =!= col("b.__id"))
      .filter(col("a.__n") > 0 &&
        col("b.__n").cast("double") >= col("a.__n").cast("double") * threshold)
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        (TextVectorExpressions.sortedIntersect(col("a.__sh"), col("b.__sh")).cast("double") /
          col("a.__n").cast("double")).as("containment"))
      .filter(col("containment") >= threshold)
  }

  /** [[containmentPairs]] with exact-duplicate pre-collapse. Unlike the
    * hash-family collapses, this one is FULLY SQL-expressible (the
    * collapse is a plain group-by on content), so the deep-duplication
    * composition itself carries a DuckDB oracle — the one place the
    * collapse pattern is proven hash-exact rather than spec-gated.
    */
  def containmentPairsCollapsed(
      docs: DataFrame, idCol: String, textCol: String, blockCol: String,
      shingleN: Int, threshold: Double
  ): DataFrame = {
    val reps = docs.groupBy(col(blockCol), col(textCol))
      .agg(min(col(idCol)).as("__rid"), count(lit(1)).as("__n"))
      .select(col("__rid").as(idCol), col(textCol), col(blockCol), col("__n"))
    containmentPairs(reps, idCol, textCol, blockCol, shingleN, threshold)
      .join(reps.select(col(idCol).as("id_a"), col("__n").as("n_a")), Seq("id_a"))
      .join(reps.select(col(idCol).as("id_b"), col("__n").as("n_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("containment"), col("n_a"), col("n_b"))
  }

  /** The persisted LSH band index of a corpus: (id, band_id, band_hash).
    * A production pipeline maintains this table incrementally — it is
    * the ONLY structure `minhashIncremental` probes, so history text is
    * never re-read for banding.
    */
  def bandIndex(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numPerm: Int = 64, bands: Int = 16): DataFrame =
    docs.select(
        col(idCol).as("__id"),
        posexplode(
          GraftExpressions.minhashBands(
            TextVectorExpressions.shingleHashes(col(textCol), shingleN), bands, numPerm / bands)
        ).as(Seq("band_id", "band_hash")))
      // Banding parameters ride in the band_hash column METADATA: Spark
      // persists field metadata in the parquet footer, so an index read
      // back months later still declares how it was built, costing zero
      // bytes per row. minhashIncremental refuses a parameter mismatch —
      // mismatched banding otherwise yields near-zero collisions, i.e.
      // SILENT false-negative dedup.
      .withMetadata("band_hash", new MetadataBuilder()
        .putLong("shingle_n", shingleN.toLong)
        .putLong("num_perm", numPerm.toLong)
        .putLong("bands", bands.toLong)
        .build())

  /** Incremental near-dup detection: today's delta batch against the
    * stored band index of the full corpus — the shape that keeps dedup
    * viable at 100 TB/day. History is touched twice, both times
    * selectively: (1) its band INDEX (a compact table, join on
    * (band_id, band_hash) buckets — only colliding buckets move), and
    * (2) its text, fetched BY ID for candidate rows only (a join against
    * the tiny candidate set). The delta is banded in one pass; exact
    * Jaccard verifies candidates. Output: (delta_id, hist_id, jaccard)
    * for verified near-dups — the delta rows to drop before appending.
    */
  def minhashIncremental(
      historyDocs: DataFrame, historyIndex: DataFrame, delta: DataFrame,
      idCol: String, textCol: String,
      shingleN: Int = 3, numPerm: Int = 64, bands: Int = 16, threshold: Double = 0.5
  ): DataFrame = {
    // Fail fast on a parameter mismatch with the persisted index (see
    // bandIndex): indexes written before metadata stamping are accepted
    // as-is — the invariant is then on the caller, as documented.
    val histMeta = historyIndex.schema.find(_.name == "band_hash").map(_.metadata)
    histMeta.filter(_.contains("shingle_n")).foreach { m =>
      require(
        m.getLong("shingle_n") == shingleN.toLong &&
          m.getLong("num_perm") == numPerm.toLong &&
          m.getLong("bands") == bands.toLong,
        s"historyIndex was built with (shingleN=${m.getLong("shingle_n")}, " +
          s"numPerm=${m.getLong("num_perm")}, bands=${m.getLong("bands")}) " +
          s"but the delta is banded with ($shingleN, $numPerm, $bands); " +
          "mismatched banding silently produces near-zero collisions")
    }
    val deltaBands = bandIndex(delta, idCol, textCol, shingleN, numPerm, bands)
    val candidates = deltaBands.as("d")
      .join(historyIndex.as("h"),
        col("d.band_id") === col("h.band_id") && col("d.band_hash") === col("h.band_hash"))
      .select(col("d.__id").as("delta_id"), col("h.__id").as("hist_id"))
      .distinct()
    val shD = delta.select(col(idCol).as("delta_id"),
      TextVectorExpressions.shingleHashes(col(textCol), shingleN).as("__sh_d"))
    val shH = historyDocs.select(col(idCol).as("hist_id"),
      TextVectorExpressions.shingleHashes(col(textCol), shingleN).as("__sh_h"))
    candidates
      .join(shD, Seq("delta_id"))
      .join(shH, Seq("hist_id"))
      .withColumn("jaccard", TextVectorExpressions.sortedJaccard(col("__sh_d"), col("__sh_h")))
      .filter(col("jaccard") >= threshold)
      .select("delta_id", "hist_id", "jaccard")
  }

  /** MinHash+LSH near-dup pipeline: candidates from banding, verified
    * with exact Jaccard ≥ threshold.
    */
  def minhashNearDups(
      docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numPerm: Int = 64, bands: Int = 16, threshold: Double = 0.5
  ): DataFrame = {
    val rowsPerBand = numPerm / bands
    val candidates  = lshCandidatePairs(docs, idCol, textCol, shingleN, bands, rowsPerBand)
    jaccardForPairs(candidates, docs, idCol, textCol, shingleN)
      .filter(col("jaccard") >= threshold)
  }

  /** [[minhashNearDups]] with exact-duplicate pre-collapse — see
    * [[simhashNearDupsCollapsed]] for the composition and the measured
    * deep-duplication cliff it removes (identical docs share every band
    * hash, so an n-copy cluster lands C(n,2) pairs in EVERY band
    * without the collapse). Output: representative pairs with
    * exact-group cardinalities.
    */
  def minhashNearDupsCollapsed(
      docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numPerm: Int = 64, bands: Int = 16, threshold: Double = 0.5
  ): DataFrame = {
    val hashed = docs.select(col(idCol).as("__id"), col(textCol).as("__text"))
      .withColumn("__chash", sha2(col("__text"), 256))
    val reps = hashed.groupBy("__chash").agg(
      min(col("__id")).as("__id"),
      first(col("__text")).as("__text"),
      count(lit(1)).as("__n"))
    minhashNearDups(reps, "__id", "__text", shingleN, numPerm, bands, threshold)
      .join(reps.select(col("__id").as("id_a"), col("__n").as("n_a")), Seq("id_a"))
      .join(reps.select(col("__id").as("id_b"), col("__n").as("n_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("jaccard"), col("n_a"), col("n_b"))
  }

  /** Resolve near-dup pairs into survivors: connected components by
    * iterative min-label propagation (each doc adopts the smallest id
    * reachable through pair edges) with POINTER DOUBLING (each round
    * additionally shortcuts label := label(label)), then keep one doc
    * per component. The shortcut makes convergence O(log diameter)
    * rounds instead of O(diameter) — a 2^64-hop chain would converge
    * inside the default iteration budget, so heavily templated crawl
    * corpora with deep near-dup chains cannot outrun the loop. If the
    * budget is ever exhausted anyway the resolver FAILS LOUDLY
    * (require) rather than silently returning mislabeled survivors.
    *
    * Cost shape (the driver-side loop is the bottleneck at any scale, so
    * jobs per iteration matter more than bytes):
    *  - the expensive pair lineage is cut ONCE with an eager
    *    localCheckpoint — iterations replay nothing;
    *  - self-loops fold the "keep own label" case into the neighbor
    *    aggregate, so each iteration is one join + one aggregation
    *    (vs join + groupBy + left-join repair);
    *  - labels only ever decrease, so sum(label) is a strictly
    *    decreasing convergence metric: ONE action per iteration both
    *    materializes the new labels' cache and decides convergence (no
    *    separate changed-rows join + isEmpty pass).
    */
  // maxIters is a runaway backstop, not a tuning knob: convergence is
  // detected after the first stable iteration, so unused headroom costs
  // nothing, and pointer doubling means 64 rounds cover any component
  // diameter up to ~2^64 — the require() below turns the impossible
  // leftover case into an error instead of silent mislabeling
  def resolveSurvivors(docs: DataFrame, pairs: DataFrame, idCol: String, maxIters: Int = 64): DataFrame = {
    // materialize the (expensive) pair computation exactly once and
    // truncate its lineage so no iteration can replay it
    val p = pairs.select(col("id_a"), col("id_b")).localCheckpoint()

    // only nodes that appear in an edge can change labels; isolated docs
    // are their own survivors and skip the loop entirely
    val nodes = p.select(col("id_a").as("node"))
      .union(p.select(col("id_b").as("node")))
      .distinct()
    // undirected edges both directions, plus self-loops: the neighbor
    // minimum then already includes the node's own label
    val edges = p.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(p.select(col("id_b").as("src"), col("id_a").as("dst")))
      .union(nodes.select(col("node").as("src"), col("node").as("dst")))

    // convergence metric: labels only ever decrease, so sum(label)
    // strictly decreases until stable. Summed as decimal(38,0), NOT
    // long — a billion-node corpus with 2^60-range ids wraps a long
    // sum, and a wrap collision between rounds would fake convergence
    // (silently mislabeled survivors, past the require below)
    def labelSum(df: DataFrame) =
      df.agg(sum(col("label").cast("decimal(38,0)"))).head()
    var labels  = nodes.withColumn("label", col("node")).persist()
    val sumRow  = labelSum(labels)
    var prevSum = if (sumRow.isNullAt(0)) BigDecimal(0) else BigDecimal(sumRow.getDecimal(0))
    var converged = sumRow.isNullAt(0) // empty edge set: nothing to resolve
    var i = 0
    while (!converged && i < maxIters) {
      val propagated = edges.join(labels, edges("dst") === labels("node"))
        .groupBy(col("src").as("node"))
        .agg(min(col("label")).as("label"))
      // pointer doubling: shortcut each node's label to its label's
      // label. Labels are always ids of nodes in the same component
      // (min over neighbors, starting from own id), so the inner join
      // total-matches; and label(x) ≤ x monotonically (self-loops put
      // own label in every neighbor min), so label(label(x)) ≤ label(x)
      // — the shortcut only ever accelerates, never regresses. Distance
      // to the component minimum halves per round → O(log diameter).
      val jumped = propagated.as("a")
        .join(propagated.as("b"), col("a.label") === col("b.node"))
        .select(col("a.node").as("node"), col("b.label").as("label"))
      // periodic lineage truncation: each iteration's plan nests the
      // previous one, so without a cut every few rounds, analysis and
      // planning cost COMPOUND with iteration count (deep components
      // would exhaust driver memory on the plan tree alone, data aside)
      val updated = if ((i + 1) % 4 == 0) jumped.localCheckpoint() else jumped.persist()
      val s = BigDecimal(labelSum(updated).getDecimal(0))
      labels.unpersist()
      labels = updated
      converged = s == prevSum
      prevSum = s
      i += 1
    }
    // unreachable for any physically possible component (2^64 hops),
    // but if it ever fires the answer would be WRONG — fail, don't return
    require(converged,
      s"resolveSurvivors did not converge within $maxIters pointer-doubling rounds")
    // survivor = isolated doc, or the doc whose id IS its component label
    val dropped = labels.filter(col("node") =!= col("label")).select(col("node").as(idCol))
    docs.join(dropped, Seq(idCol), "left_anti")
  }

  /** Edit-distance self-join (PassJoin-family segment blocking, Li et
    * al., ICDE'11 — public algorithm): all pairs with
    * levenshtein ≤ maxDist, WITHOUT the O(n²) pair space. Pigeonhole:
    * split a string into maxDist+1 contiguous segments — at most
    * maxDist edits touch at most maxDist segments, so any string
    * within distance maxDist contains at least one segment EXACTLY,
    * shifted by at most maxDist positions. Each string therefore emits
    * maxDist+1 segment keys (index role) and a CONSTANT
    * ≤ (2·maxDist+1)²·(maxDist+1) substring keys (probe role); pairs
    * arise only from an equi-join on (indexed-length, segment-ordinal,
    * content) — AQE-splittable, never a cross join — and the banded
    * Levenshtein verify runs on candidates only. The probe fanout is
    * independent of corpus size, so the shape holds at 100 TB the way
    * the LSH band join does.
    *
    * Complements the token-level families: MinHash/SimHash see
    * token-set overlap; this sees CHARACTER-level near-equality
    * (typos, OCR noise, template drift) with an exact distance
    * contract — which is also what makes it the one near-dup operator
    * whose full output sits under the DuckDB hash oracle
    * (levenshtein is deterministic on both engines).
    *
    * Output: (id_a, id_b, dist), id_a < id_b, dist ≤ maxDist.
    */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String, maxDist: Int): DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    val p = maxDist + 1 // number of segments
    val base = df.select(col(idCol).as("__id"), col(strCol).as("__s"),
      length(col(strCol)).as("__len"))

    // index role: the p segments of each string, keyed by (own length,
    // segment ordinal, segment content)
    def segStart(i: org.apache.spark.sql.Column, l: org.apache.spark.sql.Column) =
      floor(i * l / p).cast("int")
    val idx = base
      .select(col("__id").as("id_i"), col("__len").as("l"),
        explode(sequence(lit(0), lit(maxDist))).as("i"), col("__s"))
      .select(col("id_i"), col("l"), col("i"),
        col("__s").substr(segStart(col("i"), col("l")) + 1,
          segStart(col("i") + 1, col("l")) - segStart(col("i"), col("l"))).as("seg"))

    // probe role: for every plausible indexed length l' ∈ [len−d, len+d]
    // and every segment ordinal, the substrings of this string at the
    // segment's length within a ±maxDist position window. sequence() is
    // guarded: Spark yields a DESCENDING range when hi < lo.
    def boundedSeq(lo: org.apache.spark.sql.Column, hi: org.apache.spark.sql.Column) =
      when(hi >= lo, sequence(lo, hi)).otherwise(array().cast("array<int>"))
    val probe = base
      .select(col("__id").as("id_p"), col("__s"), col("__len"),
        explode(boundedSeq(greatest(col("__len") - maxDist, lit(0)).cast("int"),
          (col("__len") + maxDist).cast("int"))).as("l"))
      .select(col("id_p"), col("__s"), col("__len"), col("l"),
        explode(sequence(lit(0), lit(maxDist))).as("i"))
      .withColumn("segLen",
        segStart(col("i") + 1, col("l")) - segStart(col("i"), col("l")))
      .withColumn("pos", explode(boundedSeq(
        greatest(segStart(col("i"), col("l")) - maxDist, lit(0)),
        least(segStart(col("i"), col("l")) + maxDist, col("__len") - col("segLen")).cast("int"))))
      .select(col("id_p"), col("l"), col("i"),
        col("__s").substr(col("pos") + 1, col("segLen")).as("seg"))

    // candidates from the segment equi-join; ids normalized + deduped
    // BEFORE strings are fetched (16-byte rows through the distinct)
    val candidates = idx.join(probe, Seq("l", "i", "seg"))
      .filter(col("id_i") =!= col("id_p"))
      .select(least(col("id_i"), col("id_p")).as("id_a"),
        greatest(col("id_i"), col("id_p")).as("id_b"))
      .distinct()

    // banded verify on candidates only: the 3-arg levenshtein stops at
    // the threshold (−1 above it) instead of filling the full DP table
    val sa = base.select(col("__id").as("id_a"), col("__s").as("__sa"))
    val sb = base.select(col("__id").as("id_b"), col("__s").as("__sb"))
    candidates.join(sa, Seq("id_a")).join(sb, Seq("id_b"))
      .withColumn("dist", levenshtein(col("__sa"), col("__sb"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** 64-bit SimHash over token hashes: bit j of the fingerprint is the
    * sign of the vote sum over tokens of (bit j set ? +1 : -1). Native
    * codegen'd expression — one pass per row.
    */
  def withSimhash(df: DataFrame, textCol: String): DataFrame =
    df.withColumn(
      "simhash",
      GraftExpressions.simhash64(TextVectorExpressions.tokenHashes(col(textCol)))
    )

  /** SimHash near-dup pairs with hamming distance ≤ maxHamming:
    * pigeonhole blocking on maxHamming+1 near-equal bit chunks of the
    * 64-bit fingerprint — with k+1 chunks, any pair within distance k
    * has at least one chunk with zero flipped bits, so candidates come
    * from chunk-bucket joins with COMPLETE recall, never a cross join.
    * (maxHamming ≤ 63; larger radii leave chunks of < 1 bit.)
    */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    val chunked = simhashChunks(docs, idCol, textCol, maxHamming)
    chunked.as("a")
      .join(chunked.as("b"), col("a.chunk_id") === col("b.chunk_id") &&
        col("a.chunk_val") === col("b.chunk_val") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
      // verify BEFORE the distinct: the hamming check is a cheap map-side
      // filter, so only true near-dups reach the dedup shuffle — the
      // candidate set (quadratic in bucket occupancy) never exchanges
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** [[simhashNearDups]] with EXACT-DUPLICATE PRE-COLLAPSE — the
    * production composition for deeply-duplicated corpora. Identical
    * content (same content hash) first collapses to one representative
    * per group, so a cluster of n byte-identical copies costs O(n) in
    * one hash shuffle instead of C(n,2) pairs inside every simhash
    * chunk bucket; banding then runs on representatives only. Measured
    * on the 30× replica corpus (every doc × 30 identical copies):
    * 197 s → linear, because the quadratic term was ENTIRELY
    * duplication depth.
    *
    * Output is group-level, which is what downstream resolution
    * (survivors / reweight) consumes anyway: representative pairs
    * (id_a, id_b, hamming) with their exact-group cardinalities
    * (n_a, n_b) — a pair stands for n_a·n_b cross-copy near-dup
    * relations without materializing them.
    */
  def simhashNearDupsCollapsed(
      docs: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    val hashed = docs.select(col(idCol).as("__id"), col(textCol).as("__text"))
      .withColumn("__chash", sha2(col("__text"), 256))
    val reps = hashed.groupBy("__chash").agg(
      min(col("__id")).as("__id"),
      first(col("__text")).as("__text"),
      count(lit(1)).as("__n"))
    simhashNearDups(reps, "__id", "__text", maxHamming)
      .join(reps.select(col("__id").as("id_a"), col("__n").as("n_a")), Seq("id_a"))
      .join(reps.select(col("__id").as("id_b"), col("__n").as("n_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("hamming"), col("n_a"), col("n_b"))
  }

  /** Span-level dedup (the C4/RefinedWeb hygiene step): EXCISE every
    * `spanTokens`-token span that occurs in at least `minDocs` distinct
    * documents, then reassemble each document from its surviving tokens
    * in order. Unlike the document-level dedups above, no document is
    * dropped wholesale — only the boilerplate spans (headers, license
    * blurbs, navigation text) disappear, which is what corpus-prep
    * pipelines actually do between whole-doc dedup and quality scoring.
    *
    * Shape at 100 TB: the gram table is one narrow corpus pass
    * (O(total tokens)); hot spans come from a count-distinct
    * aggregation bounded by the distinct-gram vocabulary; position
    * cover is an equi-join from grams to hot grams (AQE-splittable; a
    * hot gram's fanout is its true occurrence count — exactly the rows
    * that must be touched to remove it) exploded ×spanTokens and
    * distinct'd; removal is a left-anti join on (doc, pos); reassembly
    * is the usual sorted-struct collect per doc. Every step is an
    * equi-shuffle — nothing quadratic, nothing driver-side. (Exact
    * substring dedup à la suffix arrays is the heavier alternative;
    * token-span granularity is the standard practical compromise.)
    *
    * Documents whose tokens are ALL excised drop out of the result —
    * callers wanting them as empty rows can left-join the output back.
    */
  def removeRepeatedSpans(docs: DataFrame, idCol: String, textCol: String,
      spanTokens: Int = 5, minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    cleanAgainstHot(docs, idCol, textCol,
      hotSpans(docs, idCol, textCol, spanTokens, minDocs), spanTokens)
  }

  /** Hot-span detection without the full index: the threshold test
    * "occurs in >= minDocs distinct docs" goes through the saturating
    * [[graft.plans.CappedDistinct.distinctAtLeast]] aggregate — ONE
    * exchange with O(minDocs) state per gram, vs countDistinct's two
    * exchanges over every distinct (gram, doc) pair. In a dense corpus
    * (tiny vocabulary, every span repeated — the regime where span
    * hygiene does the most work) that halves the shuffled gram mass and
    * caps boilerplate-gram state at minDocs ids regardless of how many
    * million documents carry the span. Falls back to the exact
    * [[spanIndex]] filter for non-integral id columns.
    */
  private def hotSpans(docs: DataFrame, idCol: String, textCol: String,
      spanTokens: Int, minDocs: Int): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    docs.schema(idCol).dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        docs.select(col(idCol).cast("long").as("__id"),
            explode(TextFunctions.wordShingles(col(textCol), spanTokens)).as("gram"))
          .groupBy("gram")
          .agg(graft.plans.CappedDistinct.distinctAtLeast(col("__id"), minDocs).as("__hot"))
          .filter(col("__hot"))
          .select("gram")
      case _ =>
        spanIndex(docs, idCol, textCol, spanTokens)
          .filter(col("n_docs") >= minDocs)
          .select("gram")
    }
  }

  /** Persisted span-frequency index: (gram, n_docs). The structure an
    * incremental pipeline maintains so that cleaning tomorrow's delta
    * never re-reads history text (mirror of [[bandIndex]] for spans).
    * Additive across corpora with DISJOINT doc sets (append-only):
    * [[mergeSpanIndex]] sums the per-gram doc counts.
    */
  def spanIndex(docs: DataFrame, idCol: String, textCol: String,
      spanTokens: Int = 5): DataFrame = {
    require(spanTokens >= 1, s"spanTokens must be >= 1, got $spanTokens")
    docs.select(col(idCol),
        posexplode(TextFunctions.wordShingles(col(textCol), spanTokens)).as(Seq("gpos", "gram")))
      .groupBy("gram")
      .agg(countDistinct(col(idCol)).as("n_docs"))
  }

  /** Index union for an append-only corpus (doc sets disjoint → doc
    * counts add): one summary-sized aggregation.
    */
  def mergeSpanIndex(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("gram").agg(sum(col("n_docs")).as("n_docs"))

  /** Right-to-be-forgotten for the span index: per-gram doc counts form
    * a GROUP (ℤ), not just a monoid — deletion is [[mergeSpanIndex]]
    * with the deleted docs' own index NEGATED, then dropping zeroed
    * grams. Exact (counts are additive over disjoint doc sets and the
    * deleted set is a subset of what was indexed), and O(deleted docs +
    * index): the surviving corpus is never rescanned — the property
    * that makes deletion affordable when the corpus is 100 TB and the
    * deletion is a user's handful of documents.
    */
  def forgetFromSpanIndex(index: DataFrame, deletedDocs: DataFrame,
      idCol: String, textCol: String, spanTokens: Int = 5): DataFrame =
    mergeSpanIndex(index,
        spanIndex(deletedDocs, idCol, textCol, spanTokens)
          .select(col("gram"), (-col("n_docs")).as("n_docs")))
      .filter(col("n_docs") > 0)

  /** Right-to-be-forgotten for the band index: rows are per-doc, so
    * deletion is one anti-join on the id — no recompute, no rescan.
    */
  def forgetFromBandIndex(index: DataFrame, deletedIds: DataFrame, idCol: String): DataFrame =
    index.join(deletedIds.select(col(idCol).as("__del")),
      col("__id") === col("__del"), "left_anti")

  /** Incremental span hygiene: clean the DELTA batch against the merged
    * (history ∪ delta) span index — row-identical to what the batch
    * [[removeRepeatedSpans]] over the full corpus produces for the
    * delta's docs (the hot set is a pure function of the merged index,
    * and cleaning is per-doc), at O(delta + index) cost. History text
    * is never touched.
    */
  def removeRepeatedSpansIncremental(historyIndex: DataFrame, delta: DataFrame,
      idCol: String, textCol: String,
      spanTokens: Int = 5, minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val merged = mergeSpanIndex(historyIndex, spanIndex(delta, idCol, textCol, spanTokens))
    val hot    = merged.filter(col("n_docs") >= minDocs).select("gram")
    cleanAgainstHot(delta, idCol, textCol, hot, spanTokens)
  }

  /** Shared cleaning path: excise every position covered by a hot span
    * and reassemble (see removeRepeatedSpans for the plan shape).
    */
  private def cleanAgainstHot(docs: DataFrame, idCol: String, textCol: String,
      hot: DataFrame, spanTokens: Int): DataFrame = {
    val grams = docs.select(col(idCol),
      posexplode(TextFunctions.wordShingles(col(textCol), spanTokens)).as(Seq("gpos", "gram")))
    // hot span STARTS per doc — a small per-doc array (≤ token count).
    // Everything token-granular stays inside per-row higher-order
    // functions below: no token-level shuffle, no sorted-struct
    // collect aggregate — only gram-level equi-shuffles ever move data
    // (measured 8.2 → 1.4 s at sf0.1 vs the explode+anti-join shape).
    val hotPerDoc = grams.join(hot, Seq("gram"))
      .groupBy(col(idCol)).agg(collect_set(col("gpos")).as("__hot_gpos"))
    val t       = filter(TextFunctions.tokens(col(textCol)), s => length(s) > 0)
    val covered = array_distinct(flatten(transform(col("__hot_gpos"),
      g => sequence(g, g + lit(spanTokens - 1)))))
    // sequence(0, -1) is DESCENDING [0, -1] in Spark, so guard the
    // token-less case explicitly or empty docs reach element_at.
    val keepIdx = filter(
      when(size(col("__t")) === 0, array().cast("array<int>"))
        .otherwise(sequence(lit(0), size(col("__t")) - 1)),
      p => !exists(col("__covered"), c => c === p))
    docs.join(hotPerDoc, Seq(idCol), "left")
      .select(col(idCol), col(textCol),
        coalesce(col("__hot_gpos"), array().cast("array<int>")).as("__hot_gpos"))
      .withColumn("__t", t)
      .withColumn("__covered", covered)
      .withColumn("__keep", keepIdx)
      .where(size(col("__keep")) > 0) // fully-excised (or empty) docs drop out
      .select(col(idCol),
        concat_ws(" ", transform(col("__keep"),
          p => element_at(col("__t"), p + 1))).as("clean_text"),
        size(col("__keep")).cast("long").as("n_tokens_kept"))
  }

  /** Span REDACTION against an EXTERNAL span set — benchmark
    * decontamination at span granularity: every occurrence of any gram
    * in `spans` (a `gram` column of spanTokens-token space-joined word
    * grams, e.g. a benchmark's shingles) is excised and the documents
    * reassembled, the contamination response when dropping whole
    * documents wastes the 99% of their content that is clean. Same
    * plan shape as [[removeRepeatedSpans]] minus the hot-detection
    * aggregation; docs whose every token is excised drop out.
    */
  def exciseSpans(docs: DataFrame, idCol: String, textCol: String,
      spans: DataFrame, spanTokens: Int): DataFrame = {
    require(spans.columns.contains("gram"),
      s"spans must carry a 'gram' column, has ${spans.columns.mkString(",")}")
    cleanAgainstHot(docs, idCol, textCol, spans.select("gram").distinct(), spanTokens)
  }

  /** SoftDeDup-style duplication reweighting: instead of DROPPING exact
    * duplicates, every copy stays in the corpus with sampling weight
    * 1/n_copies, so each distinct content contributes one unit of
    * expected training mass however many times it was crawled (soft
    * dedup as data reweighting — the gentler alternative when duplicate
    * count itself is signal). One window pass over the content hash —
    * a single equi-shuffle, no join, no driver state.
    */
  def duplicationWeights(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("content_hash"))
    docs.select(col(idCol), md5(col(textCol)).as("content_hash"))
      .withColumn("n_copies", count(lit(1)).over(w))
      .select(col(idCol), col("content_hash"), col("n_copies"),
        (lit(1).cast("double") / col("n_copies").cast("double")).as("sample_weight"))
  }

  /** Cross-doc duplicated-content fraction — the corpus-quality signal
    * behind "fraction of content in duplicated spans" filters: per
    * document, the share of token positions covered by a
    * spanTokens-token span occurring in >= minDocs distinct documents.
    * Same hot-span machinery as [[removeRepeatedSpans]], but measuring
    * instead of excising — the cheaper response when the policy is
    * drop-or-weight rather than clean-and-reassemble. Token-less docs
    * drop out; docs with no hot coverage report 0.0.
    */
  def spanDupFraction(docs: DataFrame, idCol: String, textCol: String,
      spanTokens: Int = 5, minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val hot = hotSpans(docs, idCol, textCol, spanTokens, minDocs)
    val grams = docs.select(col(idCol),
      posexplode(TextFunctions.wordShingles(col(textCol), spanTokens)).as(Seq("gpos", "gram")))
    val hotPerDoc = grams.join(hot, Seq("gram"))
      .groupBy(col(idCol)).agg(collect_set(col("gpos")).as("__hot_gpos"))
    val covered = array_distinct(flatten(transform(col("__hot_gpos"),
      g => sequence(g, g + lit(spanTokens - 1)))))
    docs.join(hotPerDoc, Seq(idCol), "left")
      .select(col(idCol), col(textCol),
        coalesce(col("__hot_gpos"), array().cast("array<int>")).as("__hot_gpos"))
      .withColumn("__t", filter(TextFunctions.tokens(col(textCol)), s => length(s) > 0))
      .where(size(col("__t")) > 0)
      .withColumn("__covered", covered)
      .select(col(idCol),
        size(col("__t")).cast("long").as("n_tokens"),
        size(col("__covered")).cast("long").as("n_dup_tokens"),
        (size(col("__covered")).cast("double") / size(col("__t")).cast("double"))
          .as("dup_fraction"))
  }

  /** (id, simhash, chunk_id, chunk_val) blocking rows shared by the
    * pair join and the candidate budget.
    */
  private[operators] def simhashChunks(
      docs: DataFrame, idCol: String, textCol: String, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 63, s"maxHamming must be in [0, 63], got $maxHamming")
    val numChunks = maxHamming + 1
    // fingerprint + chunks from ONE expression evaluation per row
    val withChunks = docs.select(col(idCol).as("__id"),
      GraftExpressions.simhashWithChunks(TextVectorExpressions.tokenHashes(col(textCol)), numChunks).as("__sc"))
    withChunks.select(
      col("__id"), col("__sc").getItem(0).as("simhash"),
      posexplode(slice(col("__sc"), 2, numChunks)).as(Seq("chunk_id", "chunk_val"))
    )
  }

  /** Sum of C(cnt, 2) over blocking buckets — the exact pre-`distinct`
    * row count the bucket self-join would produce, from ONE aggregation
    * that never materializes a pair. This is the pre-flight a 100 TB
    * pipeline runs before committing to a blocking parameterization:
    * pigeonhole blocking is only sub-quadratic while the bucket space
    * stays much larger than n (e.g. simhash radius 8 leaves 7-bit
    * chunks — fine at 5k docs, structurally quadratic at 250k), and
    * this one cheap scan says which side of that cliff you are on
    * BEFORE the join is launched. (`cnt·(cnt−1) div 2` in long math:
    * exact until a single bucket holds > ~4.3e9 rows, at which point
    * the decision is long since made.)
    */
  private def candidateBudget(blocking: DataFrame, bucketCols: Seq[String]): DataFrame =
    blocking.groupBy(bucketCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .agg(coalesce(sum(expr("cnt * (cnt - 1) div 2")), lit(0L)).as("candidate_budget"))

  /** Candidate budget of the MinHash LSH band join (see candidateBudget). */
  def lshCandidateBudget(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numPerm: Int = 64, bands: Int = 16): DataFrame =
    candidateBudget(
      bandIndex(docs, idCol, textCol, shingleN, numPerm, bands),
      Seq("band_id", "band_hash"))

  /** Candidate budget of the SimHash pigeonhole join (see candidateBudget). */
  def simhashCandidateBudget(
      docs: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame =
    candidateBudget(
      simhashChunks(docs, idCol, textCol, maxHamming),
      Seq("chunk_id", "chunk_val"))
}
