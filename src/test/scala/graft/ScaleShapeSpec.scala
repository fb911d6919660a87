package graft

import graft.operators.{Bpe, Dedup}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._

/** Scale-SHAPE audit for the structurally riskiest families (near-dup
  * blocking joins, BPE encode): sf0.1 is 17 MB, so the 100×-safety
  * claims need evidence under real volume. These tests generate a ~50×
  * synthetic corpus IN-TEST (spark.range + hash-derived pseudo-words —
  * no data files, fully deterministic) and assert CANDIDATE-PAIR COUNTS
  * and PLAN SHAPES, never wall-clock: counts are what actually grow
  * quadratically when a blocking scheme collapses, and they are exact
  * and machine-independent.
  *
  * Corpus design: every doc gets 20 md5-derived pseudo-words (unique
  * across the corpus, so chance shingle overlap is ~zero and any
  * candidate inflation is attributable to the blocking scheme itself);
  * every 1000th doc is a planted duplicate of its predecessor — exact
  * (identical text) or near (one appended word, word-shingle Jaccard
  * 18/19 ≈ 0.95) — giving a known ground-truth pair set for recall.
  */
class ScaleShapeSpec extends SparkSpec {
  import spark.implicits._

  private val N            = 250000 // 50× sf0.1's 5 000 documents
  private val PlantedEvery = 1000
  private val Planted      = N / PlantedEvery // one planted pair per block

  private def corpus(exactDups: Boolean): DataFrame = {
    val planted = col("id") % PlantedEvery === 1
    val gid     = when(planted, col("id") - 1).otherwise(col("id"))
    val base = concat_ws(" ", transform(sequence(lit(1), lit(20)),
      i => substring(md5(concat_ws("_", gid, i)), 1, 8)))
    val text =
      if (exactDups) base
      else when(planted, concat(base, lit(" extraword"))).otherwise(base)
    spark.range(N).select(col("id").as("doc_id"), text.as("text"))
  }

  private def plantedPairs: DataFrame =
    spark.range(N).filter(col("id") % PlantedEvery === 1)
      .select((col("id") - 1).as("id_a"), col("id").as("id_b"))

  test("span hygiene in the dense-vocab regime: hot detection is one exchange with O(minDocs) state") {
    // The regenerated documents corpus has a ~31-word vocabulary, so
    // 5-gram spans repeat heavily — the regime where span hygiene does
    // real work and where countDistinct's per-(gram, doc) shuffle is
    // pure waste. Reproduce that shape at 20× scale: 100k docs over a
    // 31-word vocabulary, 20 tokens each.
    val vocabWord = (i: org.apache.spark.sql.Column) =>
      substring(md5(pmod(i, lit(31)).cast("string")), 1, 6)
    val dense = spark.range(100000).select(col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(1), lit(20)),
        j => vocabWord(hash(col("id"), j).cast("long")))).as("text"))

    val cleaned = Dedup.removeRepeatedSpans(dense, "doc_id", "text", spanTokens = 5, minDocs = 2)

    // Plan shape: the hot-span subtree aggregates with the saturating
    // distinct_at_least (ObjectHashAggregate), never the two-exchange
    // countDistinct expansion, and the whole clean plan stays free of
    // nested-loop/cartesian joins.
    val plan = physicalPlan(cleaned)
    assert(plan.toString.toLowerCase.contains("distinctatleastagg"),
      "hot-span detection must use the saturating aggregate")
    assert(!plan.toString.toLowerCase.contains("count(distinct"),
      "countDistinct two-phase expansion leaked back into span hygiene")
    assert(plan.collect {
      case j: BroadcastNestedLoopJoinExec => j
      case c: CartesianProductExec        => c
    }.isEmpty, "span hygiene planned a non-equi join")

    // Semantics under density: results identical to the exact-index
    // path (a string-id clone of the corpus forces the fallback).
    val fallback = Dedup.removeRepeatedSpans(
        dense.withColumn("doc_id", col("doc_id").cast("string")),
        "doc_id", "text", spanTokens = 5, minDocs = 2)
      .withColumn("doc_id", col("doc_id").cast("long"))
    assert(cleaned.except(fallback).isEmpty && fallback.except(cleaned).isEmpty,
      "saturating hot set diverged from the exact span-index hot set")
  }

  test("DSIR at 50×: models stay bucket-bounded, corpus never shuffles into a join, selection is TakeOrdered") {
    val pool   = corpus(exactDups = true)
    val target = pool.filter(col("doc_id") % 100 === 0)

    // model size is bounded by the bucket space (16^3), NOT the corpus
    val modelRows = graft.operators.Curation.dsirModel(pool, "text").count()
    assert(modelRows <= 4096, s"model must stay bucket-bounded, got $modelRows rows")

    val plan = physicalPlan(graft.operators.Curation.dsirWeights(pool, target, "doc_id", "text"))
    val bcastJoins = plan.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }
    assert(bcastJoins.size == 2, s"both model joins must broadcast, got ${bcastJoins.size}")
    assert(plan.collect {
      case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec    => s
      case s: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => s
    }.isEmpty, "a model join shuffled the 250k-doc corpus")

    val selPlan = physicalPlan(
      graft.operators.Curation.dsirSelect(pool, target, "doc_id", "text", k = 100))
    assert(selPlan.collect {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    }.nonEmpty, "selection must plan as TakeOrderedAndProject, not a global sort")
  }

  test("minhash LSH at 50×: candidate pairs stay O(planted + accidents) with full planted recall") {
    val docs  = corpus(exactDups = false)
    val cands = Dedup.lshCandidatePairs(docs, "doc_id", "text",
      shingleN = 3, bands = 16, rowsPerBand = 4).persist()
    try {
      val total = cands.count()
      // All-pairs would be C(250k, 2) ≈ 3.1e10. The blocking claim made
      // concrete: planted dups plus a band-hash-accident allowance —
      // seven orders of magnitude under quadratic, and a ceiling that a
      // degenerate banding (constant band_hash, wrong rowsPerBand) blows
      // through immediately.
      assert(total <= Planted * 4L + 1000L,
        s"LSH candidate fanout exploded: $total pairs for $Planted planted dups")
      val recalled = cands.join(plantedPairs, Seq("id_a", "id_b")).count()
      // J ≈ 0.947 → P(miss all 16 bands) = (1 − 0.947^4)^16 ≈ 4e-12:
      // anything below full recall means the banding itself broke
      assert(recalled == Planted.toLong,
        s"LSH missed planted near-dups: $recalled of $Planted")
      // budget cross-check: the one-aggregation pre-flight bounds the
      // materialized (distinct) candidate set from above
      val budget = Dedup.lshCandidateBudget(docs, "doc_id", "text")
        .as[Long].head()
      assert(total <= budget,
        s"distinct candidates $total exceed the bucket-pair budget $budget")
    } finally cands.unpersist()
  }

  test("simhash pigeonhole at 50×: radius 1 (32-bit chunks) stays bounded, full exact-dup recall") {
    val docs  = corpus(exactDups = true)
    // radius 1 → 2 chunks of 32 bits: bucket space 4.3e9 ≫ n, so the
    // pigeonhole stays sub-quadratic at this n. (Radius 8 does NOT —
    // see the budget test below; production gates on the budget first.)
    val pairs = Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 1).persist()
    try {
      val total = pairs.count()
      assert(total <= Planted * 2L + 1000L,
        s"simhash verified-pair count exploded: $total for $Planted planted exact dups")
      val recalled = pairs.join(plantedPairs, Seq("id_a", "id_b")).count()
      assert(recalled == Planted.toLong,
        s"simhash missed planted exact dups: $recalled of $Planted (hamming 0 must always collide)")
    } finally pairs.unpersist()
  }

  test("candidate budget predicts the radius-8 cliff at 50× without materializing a single pair") {
    val docs = corpus(exactDups = true)
    val b1 = Dedup.simhashCandidateBudget(docs, "doc_id", "text", maxHamming = 1).as[Long].head()
    val b8 = Dedup.simhashCandidateBudget(docs, "doc_id", "text", maxHamming = 8).as[Long].head()
    // radius 1: planted dups collide in both 32-bit chunks (2 bucket
    // pairs each) plus a ~C(n,2)·2/2^32 ≈ 15-pair accident expectation
    assert(b1 >= Planted * 2L && b1 <= Planted * 2L + 5000L,
      s"radius-1 budget off: $b1 for $Planted planted dups")
    // radius 8 leaves 7-bit chunks: bucket space 128 ≪ n=250k, so the
    // SAME corpus is structurally quadratic (~n²/2 · 9/128 ≈ 2e9).
    // The budget — one aggregation, no join — must expose that cliff,
    // which is exactly the pre-flight a 100 TB run performs before
    // choosing blocking parameters.
    assert(b8 > 100000000L,
      s"radius-8 budget should expose the quadratic cliff at n=$N, got $b8")
  }

  test("semdedup at 10×: budget pre-flight prices the within-cell mass exactly; k is the scale knob") {
    // 50k hash-derived 64-dim vectors (≈10× sf0.1's embeddings): near-
    // uniform — SemDeDup's pair-mass worst case — with every 1000th
    // vector an EXACT copy of its predecessor (identical vectors share
    // a cell under any assignment, so ground-truth recall is exact).
    val nVec = 50000
    val dimV = 64
    val gid  = when(col("id") % PlantedEvery === 1, col("id") - 1).otherwise(col("id"))
    val vec = transform(sequence(lit(1), lit(dimV)), i =>
      conv(substring(md5(concat_ws("_", gid, i)), 1, 15), 16, 10).cast("double") / 5.76e17 - 1.0)
    val vectors = spark.range(nVec).select(col("id").as("vec_id"), vec.as("embedding"))
    val planted = spark.range(nVec).filter(col("id") % PlantedEvery === 1)
      .select((col("id") - 1).as("base"), col("id").as("dup"))

    // the pre-flight is ONE aggregation (no join): at k=256 the mass is
    // ≈ n²/(2k) ≈ 4.9M — launchable; at k=4 the SAME corpus is ~156× that
    // (structurally quadratic). A 100 TB run reads this number and scales
    // k BEFORE materializing anything.
    val b256 = graft.operators.Similarity.semDeDupBudget(
      vectors, "vec_id", "embedding", k = 256).as[Long].head()
    val b4 = graft.operators.Similarity.semDeDupBudget(
      vectors, "vec_id", "embedding", k = 4).as[Long].head()
    val quadratic = nVec.toLong * (nVec - 1) / 2
    assert(b256 < quadratic / 20,
      s"k=256 budget $b256 not meaningfully below quadratic $quadratic — cells degenerate")
    assert(b4 > b256 * 10,
      s"budget must expose the k-scaling law: k=4 → $b4 vs k=256 → $b256")

    // the materialized dedup at k=256: full planted recall (identical
    // vectors always co-cell), all bases survive, dups all drop — and on
    // unique vectors in 64-dim, accidental cosine ≥ 0.95 is ~7σ out, so
    // survivors = n − planted EXACTLY
    val survivors = graft.operators.Similarity.semDeDup(
        vectors, "vec_id", "embedding", threshold = 0.95, k = 256)
      .as[Long].collect().toSet
    val dups  = planted.select("dup").as[Long].collect()
    val bases = planted.select("base").as[Long].collect()
    assert(dups.forall(d => !survivors.contains(d)), "a planted exact dup survived semdedup")
    assert(bases.forall(survivors.contains), "a base vector was incorrectly dropped")
    assert(survivors.size == nVec - dups.length,
      s"accidental near-dup merges at 64-dim: ${nVec - dups.length - survivors.size} extra drops")
  }

  test("edit-distance blocking at 50×: pairs stay O(planted) with full exact-dup recall") {
    // titles = first 14 chars of unique md5-derived text → accidental
    // segment collisions are structurally possible but verified pairs
    // can only be planted dups (unique pseudo-words); probe fanout is
    // CONSTANT per string (≤ (2d+1)²(d+1) = 18 keys at d=1), so the
    // join mass is linear in n — the property that holds at 100 TB
    val docs   = corpus(exactDups = true)
    val titles = docs.select(col("doc_id"), substring(col("text"), 1, 14).as("title"))
    val pairs = Dedup.editDistancePairs(titles, "doc_id", "title", maxDist = 1).persist()
    try {
      val total = pairs.count()
      assert(total <= Planted * 2L + 1000L,
        s"edit-distance verified pairs exploded: $total for $Planted planted exact dups")
      val recalled = pairs.join(plantedPairs, Seq("id_a", "id_b")).count()
      assert(recalled == Planted.toLong,
        s"segment blocking missed planted exact dups: $recalled of $Planted")
      // and the pair stage never degrades past equi-joins
      val bad = physicalPlan(Dedup.editDistancePairs(titles, "doc_id", "title", maxDist = 1))
        .collect {
          case j: BroadcastNestedLoopJoinExec => j
          case c: CartesianProductExec        => c
        }
      assert(bad.isEmpty, "edit-distance join planned a nested-loop/cartesian")
    } finally pairs.unpersist()
  }

  test("bpe applyMerges: shuffle count is independent of merge-list length (merges are plan literals)") {
    val docs = corpus(exactDups = true)
    def shape(k: Int): (Int, Int) = {
      val merges = (1 to k).map(i => (s"s$i", s"t$i"))
      val plan   = physicalPlan(Bpe.applyMerges(docs, "doc_id", "text", merges))
      val nested = plan.collect {
        case j: BroadcastNestedLoopJoinExec => j
        case j: CartesianProductExec        => j
      }.size
      (plan.collect { case e: ShuffleExchangeLike => e }.size, nested)
    }
    val (ex2, nested2) = shape(2)
    val (ex8, nested8) = shape(8)
    assert(nested2 == 0 && nested8 == 0, "applyMerges planned a nested-loop join")
    // each merge folds into the SAME projection over the distinct-word
    // table — a per-merge shuffle would make k-merge encoding k passes
    assert(ex8 == ex2, s"shuffle count grew with merge count: k=2 → $ex2, k=8 → $ex8")
    assert(ex8 <= 6, s"bpe encode plans $ex8 shuffles; expected the fixed word-table shape")
  }

  test("source overlap at 50×: join mass equals the C(s,2) gram pre-flight, equi-join only") {
    // 20 sources striped over the corpus; unique pseudo-words mean the
    // ONLY cross-source grams are the planted duplicates', and every
    // planted pair (id-1, id) with id ≡ 1 (mod 1000) lands on sources
    // (s00, s01) — so the exact expected matrix is ONE cell of
    // Planted × 16 distinct shared 5-grams (20 words ⇒ 16 shingles).
    val docs = corpus(exactDups = true)
      .withColumn("source", format_string("s%02d", col("doc_id") % 20))
    val overlap = graft.operators.Curation.sourceNgramOverlap(docs, "source", "text", n = 5)
    val out = overlap.collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(out == Map(("s00", "s01") -> (Planted.toLong * 16)), s"got $out")

    // the matrix's total join mass is exactly the candidate-budget-style
    // pre-flight — sum over grams of C(#sources containing it, 2) from
    // one aggregation, no join — so a 100 TB run can price the matrix
    // BEFORE launching it
    val budget = docs
      .select(col("source"), explode(graft.functions.TextFunctions.wordShingles(col("text"), 5)).as("g"))
      .distinct()
      .groupBy("g").agg(count(lit(1)).as("s"))
      .select(sum(col("s") * (col("s") - 1) / 2).cast("long")).head().getLong(0)
    assert(budget == out.values.sum, s"pre-flight $budget != join mass ${out.values.sum}")

    // and the matrix itself never degrades past equi-joins
    val bad = physicalPlan(overlap).collect {
      case j: BroadcastNestedLoopJoinExec => j
      case c: CartesianProductExec        => c
    }
    assert(bad.isEmpty, "source overlap planned a nested-loop/cartesian join")
  }

  test("funnel under a hot key at 10×: fold and chain agree; the chain never gathers a per-user list") {
    // 500k step events where ONE bot user owns 200k of them — the skew
    // profile that makes the fold's collect_list task the straggler.
    // Interleave types by id so the bot's greedy chain is non-trivial.
    val nOrganic = 300000
    val nBot     = 200000
    val types    = array(lit("signup"), lit("view"), lit("click"), lit("purchase"))
    val organic = spark.range(nOrganic).select(
      (col("id") % 10000).as("user_id"),
      element_at(types, (col("id") % 4 + 1).cast("int")).as("event_type"),
      timestamp_micros(lit(1700000000000000L) + col("id") * 1000000L).as("ts"))
    val bot = spark.range(nBot).select(
      lit(999999L).as("user_id"),
      element_at(types, (col("id") % 4 + 1).cast("int")).as("event_type"),
      timestamp_micros(lit(1700000000000500L) + col("id") * 1000000L).as("ts"))
    val events = organic.unionByName(bot)
    val steps  = Seq("signup", "view", "click", "purchase")

    val fold  = graft.operators.Funnel.stepTimes(events, "user_id", "event_type", "ts", steps)
    val chain = graft.operators.Funnel.stepTimesChained(events, "user_id", "event_type", "ts", steps)
    val f = fold.collect().map(r => r.getLong(0) -> r.getSeq[java.sql.Timestamp](1)).toMap
    val c = chain.collect().map(r => r.getLong(0) -> r.getSeq[java.sql.Timestamp](1)).toMap
    assert(f(999999L).size == 4, "bot should complete the funnel")
    assert(c == f.filter(_._2.nonEmpty), "fold and chain disagree under the hot key")

    // the skew-safety claim is structural: the chained plan contains NO
    // list-gathering aggregate — its per-step passes are min() aggs
    chain.count()
    val gathers = physicalPlan(chain).collect {
      case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
    }
    assert(gathers.isEmpty, "chained funnel should never plan an object-hash (collect_list) aggregate")
  }

  test("collocations at 50×: margins broadcast, shuffle bounded by observed bigrams, scalar total stays 1-row") {
    val docs = corpus(exactDups = true)
    val q = graft.operators.Curation.collocations(docs, "text", minCount = 5L, k = 50)
    q.count()
    val plan = physicalPlan(q)
    // both margin joins broadcast (vocab-bounded sides never shuffle the
    // count table), and no join degrades to a nested loop over rows
    val hashJoins = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }
    assert(hashJoins.size >= 2, s"margins must broadcast-join:\n$plan")
    val shuffled = plan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec    => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    assert(shuffled.isEmpty, "no margin join may shuffle the bigram table")
    val nested = plan.collect { case j: BroadcastNestedLoopJoinExec => j }
    assert(nested.size <= 1, "only the 1-row total scalar may nested-loop")
    // the corpus' unique pseudo-words mean observed bigrams ≈ 19·N — the
    // aggregate the shuffle carries is linear, never bigram-vocab²
    val observed = docs
      .select(explode(expr(
        "zip_with(slice(split(trim(text), '\\\\s+'), 1, size(split(trim(text), '\\\\s+'))-1), " +
        "slice(split(trim(text), '\\\\s+'), 2, size(split(trim(text), '\\\\s+'))-1), (a, b) -> (a, b))")).as("p"))
      .distinct().count()
    assert(observed <= 20L * N, s"observed bigrams $observed exceed the linear bound")
  }

  test("KLL at 50×: sketch state stays O(k) under heavy compaction and rollup holds the rank bound") {
    import graft.operators.Sketches
    // 250k skewed values (hash-spread, deterministic), 50 shards
    val k = 200
    val vals = spark.range(250000).select(
      (col("id") % 50).as("shard"),
      (xxhash64(col("id")) % 100000).cast("double").as("v"))
    val partials = Sketches.partialQuantileSketches(vals, Seq.empty, Seq("shard"), "v", k = k)
      .select(octet_length(col("sketch")).as("bytes"))
      .agg(max("bytes"), sum("bytes")).head()
    // KLL state is O(k log(n/k)) items: 5k values/shard at k=200 must
    // stay in the low KBs per sketch — the persisted-partial cost model
    assert(partials.getInt(0) < 16 * 1024,
      s"a single shard sketch blew past the O(k) state bound: ${partials.getInt(0)} bytes")

    val rolled = Sketches.mergeQuantileSketches(
        Sketches.partialQuantileSketches(vals, Seq.empty, Seq("shard"), "v", k = k),
        Seq.empty, probs = Seq(0.1, 0.5, 0.9, 0.99), k = k)
      .select("quantiles").head().getSeq[Double](0)
    val eps    = org.apache.datasketches.kll.KllSketch.getNormalizedRankError(k, false)
    val sorted = vals.select("v").as[Double].collect().sorted
    val n      = sorted.length
    for ((p, est) <- Seq(0.1, 0.5, 0.9, 0.99).zip(rolled)) {
      val below    = sorted.count(_ <= est).toDouble / n
      val strictly = sorted.count(_ < est).toDouble / n
      // the union of 50 compacted sketches must still honor ~the single
      // sketch bound (allow 2x for merge degradation)
      assert(strictly - 2 * eps <= p && p <= below + 2 * eps,
        s"rolled-up p=$p est=$est rank in [$strictly, $below] exceeds 2*eps=${2 * eps}")
    }
  }
}
