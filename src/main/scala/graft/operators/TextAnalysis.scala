package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data curation: token statistics, quality
  * scoring, heuristic language ID, and winnowing fingerprints. The
  * token/char-class counters all come from the one-pass TextProfile
  * kernel (plans/TextVectorExpressions.scala) — one tokenization + one
  * code-point scan per row instead of repeated split/regexp passes; the
  * derived ratios are bit-identical to the split/regexp formulations.
  *
  * TextProfile slot layout: 0=n_tokens, 1=n_distinct_tokens,
  * 2=n_codepoints, 3=[A-Za-z ], 4=[0-9], 5=[.,;:!?], 6=CJK, 7+i=count of
  * tokens whose lowercase form is in sets(i).
  */
object TextAnalysis {

  private def profile(text: Column, sets: Seq[Seq[String]] = Nil): Column =
    graft.plans.TextVectorExpressions.textProfile(text, sets)

  /** Per-document token statistics — one kernel pass. */
  def tokenStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("__c", profile(col(textCol))).select(
      col(idCol),
      col("__c").getItem(0).as("n_tokens"),
      col("__c").getItem(1).as("n_unique_tokens"),
      (col("__c").getItem(2).cast("double") / col("__c").getItem(0)).as("chars_per_token")
    )

  private val Stopwords = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "for", "on", "with", "as", "at", "by")

  /** Quality features + a composite score in [0,1]: high alpha ratio,
    * low digit/punct noise, reasonable stopword share. Every count comes
    * from the single TextProfile pass; the char-class ratios divide the
    * kernel's code-point counters exactly as the regexp formulation
    * divides `length(regexp_replace(...))` by `length(text)`.
    */
  def qualityScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val c = col("__c")
    def ratio(slot: Int): Column = c.getItem(slot).cast("double") / c.getItem(2)
    df.withColumn("__c", profile(col(textCol), Seq(Stopwords))).select(
      col(idCol),
      c.getItem(2).as("n_chars"),
      c.getItem(0).as("n_tokens"),
      ratio(3).as("alpha_ratio"),
      ratio(4).as("digit_ratio"),
      ratio(5).as("punct_ratio"),
      (c.getItem(7).cast("double") / c.getItem(0)).as("stopword_ratio")
    ).withColumn(
      "quality_score",
      round(
        col("alpha_ratio") * 0.5 +
          (lit(1.0) - least(col("digit_ratio") * 5, lit(1.0))) * 0.2 +
          (lit(1.0) - least(col("punct_ratio") * 5, lit(1.0))) * 0.1 +
          least(col("stopword_ratio") * 5, lit(1.0)) * 0.2,
        6
      )
    )
  }

  /** Heuristic language ID: CJK character share decides zh; otherwise the
    * highest stopword-profile hit count wins (ties break in profile
    * order). A real system would use fastText/CLD3; the n-gram heuristic
    * is the reference-free, dependency-free variant. All profile hit
    * counts AND the CJK numerator come from one kernel pass.
    */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val profiles: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "was"),
      "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "los", "es"),
      "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"),
      "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "des", "que", "dans")
    )
    val counts   = profile(col(textCol), profiles.map(_._2))
    val cjkRatio = col("__c").getItem(6).cast("double") / col("__c").getItem(2)
    val scored = profiles.zipWithIndex.foldLeft(df.withColumn("__c", counts)) {
      case (acc, ((lang, _), i)) => acc.withColumn(s"__score_$lang", col("__c").getItem(7 + i))
    }
    val best = profiles.map { case (lang, _) => (lang, col(s"__score_$lang")) }
      .foldLeft(lit("unknown").as("l") -> lit(-1L).as("s")) { case ((bl, bs), (lang, score)) =>
        (when(score > bs, lit(lang)).otherwise(bl), when(score > bs, score).otherwise(bs))
      }
    scored
      .withColumn("predicted_lang", when(cjkRatio > 0.05, lit("zh")).otherwise(best._1))
      .select(col(idCol), col("predicted_lang"))
  }

  /** Gopher-style repetition features (Rae et al. 2021, §A1.1: the
    * "repetitious text" removal rules): duplicate-word fraction and
    * duplicate n-gram fractions. Heavily repeated boilerplate (SEO spam,
    * keyword stuffing, template text) scores high and gets filtered
    * before training. Word counts come from the one-pass TextProfile
    * kernel; n-gram duplication from the shingle builders shared with
    * the Jaccard dedup family.
    *
    * `is_repetitive` applies Gopher's published thresholds (duplicate
    * 2-grams > 0.2, duplicate 3-grams > 0.18, plus a 0.3 duplicate-word
    * bound) — callers wanting different cut-offs filter on the fractions
    * directly.
    */
  def repetitionProfile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // [cnt1, dist1, cnt2, dist2, cnt3, dist3] in one kernel pass — the
    // HOF shingle formulation re-evaluates the whole gram pipeline per
    // reference (measured 36 s vs sub-second at sf0.1)
    val c = col("__g")
    def dupFrac(cnt: Column, dist: Column): Column =
      when(cnt === 0, lit(0.0)).otherwise(lit(1.0) - dist.cast("double") / cnt)
    df.withColumn("__g", graft.plans.TextVectorExpressions.ngramProfile(col(textCol), Seq(1, 2, 3)))
      .select(
        col(idCol),
        c.getItem(0).as("n_tokens"),
        (lit(1.0) - c.getItem(1).cast("double") / c.getItem(0)).as("dup_word_frac"),
        dupFrac(c.getItem(2), c.getItem(3)).as("dup_2gram_frac"),
        dupFrac(c.getItem(4), c.getItem(5)).as("dup_3gram_frac")
      ).withColumn(
        "is_repetitive",
        col("dup_word_frac") > 0.3 || col("dup_2gram_frac") > 0.2 || col("dup_3gram_frac") > 0.18
      )
  }

  /** Corpus-relative token rarity — the CCNet-style language-model
    * quality proxy in its integer-exact form: per document, the mean
    * corpus frequency of its tokens and the fraction of tokens that are
    * corpus-rare (count <= rareThreshold). Gibberish, OCR noise, and
    * random identifiers score high on rare_token_frac; templated
    * boilerplate scores very low. Integer sums + exact division keep
    * the result bit-identical across engines (a float log-prob mean
    * would be partition-order-dependent).
    *
    * Scale shape: one shuffle to build the corpus frequency table, one
    * token-key join to score (at 100 TB the frequency table is built
    * once, persisted, and reused across scoring runs).
    */
  def rarityProfile(df: DataFrame, idCol: String, textCol: String, rareThreshold: Long = 2L): DataFrame = {
    val toks = df.select(col(idCol),
      explode(graft.functions.TextFunctions.tokens(col(textCol))).as("__tok"))
    val freq = toks.groupBy(col("__tok")).agg(count(lit(1)).as("__c"))
    toks.join(freq, Seq("__tok"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(col("__c")).as("sum_freq"),
        sum(when(col("__c") <= rareThreshold, 1L).otherwise(0L)).as("n_rare")
      )
      .select(
        col(idCol), col("n_tokens"), col("sum_freq"),
        (col("sum_freq").cast("double") / col("n_tokens")).as("mean_token_freq"),
        (col("n_rare").cast("double") / col("n_tokens")).as("rare_token_frac")
      )
  }

  /** Per-document keyword extraction by a linear-idf tf-idf score:
    * score = tf / df (term frequency over corpus document frequency).
    * The ratio of two exact integer counts divides identically in every
    * IEEE-754 engine — unlike a log-idf, whose last ulp depends on the
    * libm — so ranks are engine-exact; ties break on the token string.
    *
    * Scale shape: one shuffle on (doc, token) for tf; df is an
    * aggregation OF tf (vocab-sized, Zipf-small next to the corpus), and
    * the tf⨝df join is a vocab-key join AQE turns into a broadcast when
    * df fits. No corpus re-scan, no all-pairs anything.
    */
  def keywords(df: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol),
      explode(graft.functions.TextFunctions.tokens(col(textCol))).as("__tok"))
    val tf    = toks.groupBy(col(idCol), col("__tok")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("__tok")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("__tok").asc)
    tf.join(dfreq, "__tok")
      .withColumn("score", col("tf").cast("double") / col("df"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("__tok").as("token"), col("tf"), col("df"), col("score"))
  }

  /** Count-based n-gram language-model coverage score: the corpus
    * itself is the model (n-grams occurring ≥ `minCount` times), and a
    * document scores by the fraction of its n-gram occurrences the
    * model covers plus the mean model count of its n-grams — the
    * KenLM-style "does this text look like the corpus" signal in
    * DIVISION-ONLY form. A true log-probability perplexity would put
    * `ln` in the output and engines disagree in the last ulp of libm;
    * coverage and mean-count are ratios of exact integers, so the
    * scores hash-match across engines while ranking documents the same
    * way (low coverage = out-of-distribution / noisy text).
    *
    * Scale shape (same as [[rarityProfile]]): one shuffle on the n-gram
    * for model counts — vocabulary-bounded (Zipf-small next to the
    * corpus), map-side combined — then one n-gram-keyed join that AQE
    * broadcasts when the model fits, one per-doc aggregation. The
    * model can be persisted and reused across daily slices, making the
    * scoring pass itself join + agg only.
    */
  def ngramLmScore(df: DataFrame, idCol: String, textCol: String,
      n: Int = 2, minCount: Long = 2L): DataFrame = {
    // per-(doc, gram) pre-aggregation FIRST: the scored side's join and
    // the final per-doc aggregate then see one row per distinct
    // (doc, gram) instead of one per gram INSTANCE (1.55x at sf0.1 on
    // the minCount=2 shape; flat at the floor-bound bench entry), and
    // because any partitioning on idCol alone satisfies the
    // (idCol, gram) clustering, the pre-aggregation adds NO exchange on
    // a doc-partitioned input. The model still derives from its own
    // corpus pass (plan inlining keeps the tokenize per join side; only
    // the scan+exchange stage is AQE-reused) — forcing a shared
    // exchange under the tokenize would trade a gram-stream shuffle for
    // the pass, the wrong trade at scale (§2.3). Weighting by the
    // per-doc gram count k keeps the arithmetic exact: n_ngrams = Σk,
    // n_covered = Σk·[covered], sum_model_count = Σk·c — bit-identical
    // to the instance-level sums (oracle-pinned).
    val grams = df.select(col(idCol),
      explode(graft.functions.TextFunctions.wordShingles(col(textCol), n)).as("__g"))
    val perDoc = grams.groupBy(col(idCol), col("__g")).agg(count(lit(1)).as("__k"))
    val model = perDoc.groupBy(col("__g")).agg(sum(col("__k")).as("__c"))
      .filter(col("__c") >= minCount)
    perDoc.join(model, Seq("__g"), "left")
      .groupBy(col(idCol))
      .agg(
        sum(col("__k")).as("n_ngrams"),
        sum(when(col("__c").isNotNull, col("__k")).otherwise(0L)).as("n_covered"),
        sum(col("__k") * coalesce(col("__c"), lit(0L))).as("sum_model_count")
      )
      .select(
        col(idCol), col("n_ngrams"), col("n_covered"),
        (col("n_covered").cast("double") / col("n_ngrams")).as("coverage"),
        (col("sum_model_count").cast("double") / col("n_ngrams")).as("mean_model_count")
      )
  }

  /** Sparse (lexical) retrieval — the tf-idf counterpart of the dense
    * ANN family: top-k most similar documents to each probe by cosine
    * over tf-idf weights, computed through a token INVERTED join (probe
    * tokens ⨝ corpus postings), never a doc×doc product. Weights are
    * FIXED-POINT: w = tf·SCALE ∕ df in integer division, so dots and
    * norms are exact longs and the final cosine is a deterministic
    * (sqrt, ·, ÷) of exact integers — engines agree bit-for-bit where
    * a float-accumulated dot depends on summation order.
    *
    * Scale shape: tf and df are the [[keywords]] aggregations (one
    * (doc, token) shuffle + a vocab-sized df); the candidate join keys
    * on token with fanout bounded by df (stopword-like tokens weigh
    * ~0 under idf and can be pruned by a df cap upstream); per-pair
    * cost is one long multiply-add in a hash aggregate. Probes are a
    * handful of ids — their side broadcasts.
    */
  def tfidfTopK(df: DataFrame, idCol: String, textCol: String,
      probeIds: Seq[Long], k: Int = 5, scale: Long = 10000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol),
      explode(graft.functions.TextFunctions.tokens(col(textCol))).as("__tok"))
    val tf    = toks.groupBy(col(idCol), col("__tok")).agg(count(lit(1)).as("__tf"))
    val dfreq = tf.groupBy(col("__tok")).agg(count(lit(1)).as("__df"))
    // `div`, not `/`: Spark's Divide on integral inputs returns DOUBLE;
    // the fixed-point contract needs true integer division (positive
    // operands, so Spark's truncation == DuckDB's floor `//`)
    val w = tf.join(dfreq, "__tok")
      .select(col(idCol), col("__tok"),
        expr(s"__tf * ${scale}L div __df").as("__w"))
    // docs whose EVERY token weight truncates to zero (tf·scale < df
    // for all their tokens — pure-stopword docs at large N) have no
    // cosine direction; defining them out keeps the division total.
    // idf-zero truncation is the fixed-point stopword prune: weights
    // scale as tf/df, and df > tf·scale means idf-negligible anyway.
    val norms = w.groupBy(col(idCol))
      .agg(sum(col("__w") * col("__w")).as("__norm2"))
      .filter(col("__norm2") > 0)

    val probes = w.filter(col(idCol).isin(probeIds: _*))
      .select(col(idCol).as("probe_id"), col("__tok"), col("__w").as("__wp"))
    val dots = probes.join(w.select(col(idCol), col("__tok"), col("__w")), Seq("__tok"))
      .filter(col(idCol) =!= col("probe_id"))
      .groupBy(col("probe_id"), col(idCol))
      .agg(sum(col("__wp") * col("__w")).as("__dot"))
    val scored = dots
      .join(norms.select(col(idCol).as("probe_id"), col("__norm2").as("__np")), Seq("probe_id"))
      .join(norms, Seq(idCol))
      .withColumn("sim", col("__dot").cast("double") /
        (sqrt(col("__np").cast("double")) * sqrt(col("__norm2").cast("double"))))
    val rank = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(rank))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col(idCol), col("sim"))
  }

  /** BM25 retrieval (Robertson–Spärck Jones, k1=1.2 b=0.75) in the same
    * fixed-point deterministic form as [[tfidfTopK]]: every per-term
    * quantity is an exact long, so the ranking hash-matches any engine
    * that does the same integer arithmetic — no float accumulation
    * order, no libm `ln` (whose last ulp differs between runtimes).
    *
    * Two substitutions make the score rational:
    *   - avgdl enters as `avgdl_fp = (100·Σdl) div N` (centitokens);
    *     the tf-saturation term, multiplied through by `10·avgdl_fp`,
    *     becomes `sat_fp = (22·tf·avgdl_fp·10000) div
    *     (10·tf·avgdl_fp + 3·avgdl_fp + 900·dl)` — exact longs, the
    *     classic `tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))` with k1=6/5,
    *     b=3/4 cleared of denominators.
    *   - idf uses the RS-J odds ratio without the log:
    *     `idf_fp = ((2N−2df+1)·1000) div (2df+1)` — strictly positive
    *     (df ≤ N) and monotone in the true `ln`-idf, so the top-k set
    *     ranks terms identically for any single-term match and very
    *     nearly so for sums (the log only compresses the tail).
    *
    * score_fp(q,d) = Σ_{t ∈ distinct(q)} idf_fp(t)·sat_fp(d,t), summed
    * as longs; the reported double is score_fp / 10^7, one exact
    * division per row. Overflow envelope: idf_fp ≤ 2000·N, sat_fp ≤
    * 22000, so |q| ≤ 2^63 / (4.4·10^7·N) query terms are safe — at
    * N = 10^10 docs that is ~2·10^4 distinct probe terms.
    *
    * Plan shape: identical to [[tfidfTopK]] — tf/df/dl are one
    * (doc,token) shuffle plus a vocab-sized aggregate; the corpus stats
    * row (N, avgdl_fp) broadcasts; the candidate join keys on token
    * with fanout bounded by df; top-k is a per-probe window over the
    * matched candidates only.
    */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      probeIds: Seq[Long], k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // __dl (doc length) is size(tokens) computed BEFORE the explode and
    // carried through the tf aggregate as first(): split() yields >= 1
    // element for non-null text (an empty doc tokenizes to [""], the
    // same single token the oracle counts) and null-text docs emit no
    // exploded rows on either engine — so sum-of-tf == size(tokens)
    // exactly wherever a tf row exists. This removes the round-14
    // shape's tf ⨝ groupBy(doc) self-join for the saturation term (two
    // doc-keyed exchanges + a join, gone — `sat` is now a projection
    // over tf).
    // two-step select so size() and the explode share ONE split
    // evaluation (see InvertedIndex.termFreqs — a single projection
    // would run the regex split twice per row)
    val toks = df
      .select(col(idCol), graft.functions.TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), size(col("__toks")).cast("long").as("__dl0"),
        explode(col("__toks")).as("__tok"))
    val tf = toks.groupBy(col(idCol), col("__tok"))
      .agg(count(lit(1)).as("__tf"), first(col("__dl0")).as("__dl"))
    val dl = tf.groupBy(col(idCol)).agg(first(col("__dl")).as("__dl"))
    val stats = dl.agg(count(lit(1)).as("__n"), sum(col("__dl")).as("__t"))
      .select(col("__n"), expr("100L * __t div __n").as("__avgdl_fp"))
    val dfreq = tf.groupBy(col("__tok")).agg(count(lit(1)).as("__df"))
    val idf = dfreq.crossJoin(broadcast(stats))
      .select(col("__tok"),
        expr("(2L * __n - 2L * __df + 1L) * 1000L div (2L * __df + 1L)").as("__idf_fp"))
    val sat = tf.crossJoin(broadcast(stats))
      .select(col(idCol), col("__tok"),
        expr("22L * __tf * __avgdl_fp * 10000L div " +
          "(10L * __tf * __avgdl_fp + 3L * __avgdl_fp + 900L * __dl)").as("__sat_fp"))
    val qterms = tf.filter(col(idCol).isin(probeIds: _*))
      .select(col(idCol).as("probe_id"), col("__tok"))
    val scored = qterms
      .join(sat, Seq("__tok"))
      .filter(col(idCol) =!= col("probe_id"))
      .join(idf, Seq("__tok"))
      .groupBy(col("probe_id"), col(idCol))
      .agg(sum(col("__idf_fp") * col("__sat_fp")).as("__score_fp"))
    val rank = Window.partitionBy(col("probe_id"))
      .orderBy(col("__score_fp").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(rank))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col(idCol),
        (col("__score_fp").cast("double") / 1.0e7).as("score"))
  }

  /** Hybrid lexical+dense retrieval with reciprocal-rank fusion — the
    * standard RAG-stack shape (Cormack et al. 2009: RRF outperforms any
    * individual ranker; every production search stack fuses BM25 with an
    * embedding index this way). Two independent top-`depth` lists per
    * probe — [[bm25TopK]] over the text inverted index and
    * [[graft.operators.Similarity.bruteForceTopK]] over the embedding
    * table — fused by `Σ 1_000_000 div (rrfK + rank)`: integer division
    * on integer ranks, so the fused ordering is engine-exact (the usual
    * `Σ 1/(k+r)` floats are one `CAST(x AS DOUBLE)/1e6` away).
    *
    * The dense side covers only ids present in `emb` (a dense index over
    * a corpus subset is the normal deployment); docs outside it compete
    * on their lexical score alone — RRF handles partial lists by
    * construction.
    *
    * Scale: both branch plans are the bounded shapes documented on their
    * operators (inverted token join / broadcast probe sweep); the fusion
    * itself joins two ≤ |probes|·depth row lists — negligible. At 100 TB
    * the dense branch swaps to the IVF/PQ shortlist family; the fusion
    * is unchanged.
    */
  def hybridRrfTopK(docs: DataFrame, emb: DataFrame, idCol: String, textCol: String,
      embIdCol: String, vecCol: String, probeIds: Seq[Long],
      depth: Int = 20, k: Int = 5, rrfK: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lex = bm25TopK(docs, idCol, textCol, probeIds, k = depth)
      .select(col("probe_id"), col(idCol).as("__id"), col("rank").as("__lex_rank"))
    val den = graft.operators.Similarity.bruteForceTopK(
        probes = emb.filter(col(embIdCol).isin(probeIds: _*)),
        candidates = emb.filter(!col(embIdCol).isin(probeIds: _*)),
        idCol = embIdCol, vecCol = vecCol, k = depth)
      .select(col("probe_id"), col("neighbor_id").as("__id"), col("rank").as("__den_rank"))
    rrfFuseRanked(lex, den, idCol, k, rrfK)
  }

  /** RRF fusion of two ranked lists — `lex` as (probe_id, __id,
    * __lex_rank), `den` as (probe_id, __id, __den_rank). Shared by the
    * from-scratch [[hybridRrfTopK]] and the indexed serving path
    * (`search_hybrid_served`): rank fusion is ranker-agnostic, so
    * swapping a branch for its serving index cannot change the fusion
    * arithmetic.
    */
  private[graft] def rrfFuseRanked(lex: DataFrame, den: DataFrame, idCol: String,
      k: Int, rrfK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fused = lex.join(den, Seq("probe_id", "__id"), "full_outer")
      .select(col("probe_id"), col("__id"),
        (coalesce(lit(1000000L).cast("long") divAsLong (lit(rrfK) + col("__lex_rank")), lit(0L)) +
         coalesce(lit(1000000L).cast("long") divAsLong (lit(rrfK) + col("__den_rank")), lit(0L)))
          .as("rrf_fp"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("rrf_fp").desc, col("__id").asc)
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("__id").as(idCol), col("rrf_fp"))
  }

  /** Hybrid retrieval for RAW QUERY TEXT plus a raw query vector,
    * ANSWERED FROM THE SERVING INDEXES (the SQL/TVF surface's shape):
    * the lexical branch serves BM25 from the inverted index at
    * `lexDir`, the dense branch serves IVF from the ANN index at
    * `annDir`, fused by the same ranker-agnostic [[rrfFuseRanked]] as
    * every other hybrid path. The query is NOT a corpus document, so
    * neither branch self-excludes. An optional predicate filters BOTH
    * branches through their metadata sidecars BEFORE the depth-`depth`
    * rankings (filtered-search semantics; both indexes must have been
    * built with the predicate's sidecar columns).
    */
  def hybridTopKText(spark: org.apache.spark.sql.SparkSession,
      lexDir: String, annDir: String, query: String, vector: Array[Double],
      k: Int = 5, depth: Int = 20, nProbe: Int = 4, rrfK: Int = 60,
      where: Option[Column] = None): DataFrame = {
    import spark.implicits._
    val lex = graft.operators.InvertedIndex
      .bm25TopKText(spark, lexDir, Seq(query), k = depth, where = where)
      .select(lit(0L).as("probe_id"), col("doc_id").as("__id"),
        col("rank").as("__lex_rank"))
    val probe = Seq((0L, vector.toSeq)).toDF("probe_id", "embedding")
    val den = graft.operators.AnnIndex
      .topK(probe, "probe_id", "embedding", annDir,
        k = depth, nProbe = nProbe, excludeSelf = false, where = where)
      .select(col("probe_id"), col("neighbor_id").as("__id"),
        col("rank").as("__den_rank"))
    rrfFuseRanked(lex, den, "doc_id", k, rrfK)
      .select(col("rank"), col("doc_id"), col("rrf_fp"))
  }

  /** `a div b` on Columns (Spark's integer division) without SQL-string
    * splicing of column names.
    */
  private implicit final class DivOps(private val a: Column) {
    def divAsLong(b: Column): Column = (a / b).cast("long") // floor for positive operands
  }

  private val GopherStopwords = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher document-quality rules (Rae et al. 2021, §A1.1) in their
    * integer-exact form: every threshold test multiplies through by the
    * denominator so both engines compare exact integers — no float
    * ratio sits on a boundary. The published thresholds: 50..100,000
    * words; mean word length 3..10; symbol-to-word ratio (# and ...)
    * below 0.1; ≥80% of words contain an alphabetic character; at least
    * two stopword hits. (The line-shape rules — bullet starts, ellipsis
    * ends — need line structure the `documents` corpus does not carry
    * and are omitted.)
    *
    * One pruned scan: token/char/stopword counts from the one-pass
    * TextProfile kernel, symbol counts from two `replace` passes, the
    * alpha-word count from a single HOF filter over one tokenization.
    */
  def gopherRules(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val c = col("__c")
    val t = col(textCol)
    // occurrences via length deltas: replace() is exact and cheap in
    // both engines, unlike a per-symbol regex pass
    val nHash     = length(t) - length(regexp_replace(t, "#", ""))
    val nEllipsis = (length(t) - length(regexp_replace(t, "\\.\\.\\.", ""))) / 3
    val nAlphaWords =
      size(filter(graft.functions.TextFunctions.tokens(t), w => w.rlike("[A-Za-z]")))
    df.withColumn("__c", profile(t, Seq(GopherStopwords)))
      .select(
        col(idCol),
        c.getItem(0).as("n_tokens"),
        c.getItem(2).as("n_chars"),
        length(regexp_replace(t, "\\s", "")).cast("long").as("n_word_chars"),
        (nHash + nEllipsis).cast("long").as("n_symbols"),
        nAlphaWords.cast("long").as("n_alpha_words"),
        c.getItem(7).as("n_stop_hits"))
      .withColumn("words_ok", col("n_tokens") >= 50 && col("n_tokens") <= 100000)
      // 3 <= mean word length <= 10, multiplied through by n_tokens
      .withColumn("word_len_ok",
        col("n_word_chars") >= col("n_tokens") * 3 && col("n_word_chars") <= col("n_tokens") * 10)
      // symbol-to-word ratio < 0.1 ⇔ 10 * symbols < words
      .withColumn("symbols_ok", col("n_symbols") * 10 < col("n_tokens"))
      // >= 80% alpha-bearing words ⇔ 5 * alpha_words >= 4 * words
      .withColumn("alpha_ok", col("n_alpha_words") * 5 >= col("n_tokens") * 4)
      .withColumn("stopwords_ok", col("n_stop_hits") >= 2)
      .withColumn("passes_gopher",
        col("words_ok") && col("word_len_ok") && col("symbols_ok") &&
          col("alpha_ok") && col("stopwords_ok"))
  }

  // URL first (a URL may embed an @), then email, then long digit runs.
  // The patterns stay inside the RE2 ∩ java.util.regex common dialect:
  // plain classes and bounded quantifiers, no backreferences/lookaround.
  private val UrlRe   = "https?://[^\\s]+"
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val DigitRunRe = "[0-9]{7,}"

  /** PII scrubbing: mask emails, URLs, and long digit runs (phone/account
    * numbers) with placeholder tokens, and report per-document match
    * counts. Pure per-row projection — no shuffle, fully parallel, the
    * counts come from `regexp_count` on the ORIGINAL text so they are
    * independent of replacement order.
    */
  def scrubPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      regexp_replace(regexp_replace(regexp_replace(t,
        UrlRe, "<URL>"), EmailRe, "<EMAIL>"), DigitRunRe, "<NUM>").as("scrubbed"),
      regexp_count(t, lit(UrlRe)).cast("long").as("n_urls"),
      regexp_count(t, lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(t, lit(DigitRunRe)).cast("long").as("n_digit_runs"))
  }

  /** Multi-pattern exact-substring screening (canary strings, benchmark
    * digests, blocklist phrases) by ONE Aho-Corasick pass per document
    * (plans/TextVectorExpressions.scala `MultiPatternCounts`): per-doc
    * total occurrences and needle coverage, O(length + matches)
    * regardless of needle count — the per-needle `contains`/`replace`
    * formulation is O(needles × length) and is exactly what the DuckDB
    * oracle runs. Totals/coverage derive from the single counts vector
    * with codegen'd HOFs, so the kernel runs once per row.
    */
  def multiMatch(df: DataFrame, idCol: String, textCol: String,
      needles: Seq[String]): DataFrame = {
    val counts = graft.plans.TextVectorExpressions.multiPatternCounts(col(textCol), needles)
    df.select(col(idCol), counts.as("__mc"))
      .select(col(idCol),
        aggregate(col("__mc"), lit(0L), (a, x) => a + x).as("n_hits"),
        size(filter(col("__mc"), _ > lit(0L))).cast("long").as("needles_hit"))
  }

  /** Winnowing fingerprint (Schleimer et al., SIGMOD 2003): hash char
    * k-grams, slide a window of w hashes, keep each window's minimum.
    * Near-dup docs share most fingerprints even after local edits.
    * Native one-pass kernel (plans/TextVectorExpressions.scala) — the
    * HOF formulation allocates a slice per window.
    */
  def winnowingFingerprints(df: DataFrame, idCol: String, textCol: String, k: Int = 8, w: Int = 4): DataFrame =
    df.withColumn("fingerprints",
        graft.plans.TextVectorExpressions.winnowingFingerprints(col(textCol), k, w))
      .select(col(idCol), col("fingerprints"), size(col("fingerprints")).as("n_fingerprints"))

  /** Linear classifier inference over hashed token features — the shape
    * of a fasttext-style quality/toxicity classifier applied at corpus
    * scale: score(doc) = mean over tokens of weight(hash(token)). A real
    * deployment broadcasts a trained weight table; here the weight is
    * derived from the token's md5 (two hex chars → an integer in
    * [-3, 3]), which keeps the whole computation integer-exact and
    * engine-reproducible while exercising the identical plan: a pure
    * per-row map (tokenize → hash → gather weights → reduce), no
    * shuffle, no UDF — `transform`/`aggregate` higher-order functions
    * stay inside codegen. At 100 TB this is exactly scan-bound.
    */
  def classifierScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = graft.functions.TextFunctions.tokens(col(textCol))
    val weights = transform(toks, t =>
      ((ascii(substring(md5(t), 1, 1)) + ascii(substring(md5(t), 2, 1))) % 7 - 3).cast("long"))
    df.select(
        col(idCol),
        size(toks).cast("long").as("n_tokens"),
        aggregate(weights, lit(0L), (acc, x) => acc + x).as("score_sum"))
      .withColumn("score", col("score_sum").cast("double") / col("n_tokens"))
      .withColumn("keep", col("score") >= 0.0)
  }
}
