package graft

import graft.operators.{Curation, TextAnalysis}
import org.apache.spark.sql.functions._

/** Corpus-curation operators: deterministic sampling, quality-aware
  * dedup, decontamination, vocabulary.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("stratified sample is deterministic and tracks requested fractions") {
    val docs = Tables(spark, sfDir).documents
    val s1 = Curation.stratifiedSample(docs, "doc_id", "source",
      Map("src0" -> 0.5), defaultFraction = 0.25)
    val s2 = Curation.stratifiedSample(docs, "doc_id", "source",
      Map("src0" -> 0.5), defaultFraction = 0.25)
    // same rows regardless of execution (no RNG state)
    assert(s1.select("doc_id").collect().toSet == s2.select("doc_id").collect().toSet)

    // fractions hold within md5-uniformity tolerance on the full corpus
    val n     = docs.count().toDouble
    val kept  = Curation.stratifiedSample(docs, "doc_id", "source", Map.empty, 0.25).count().toDouble
    assert(math.abs(kept / n - 0.25) < 0.08, s"expected ~25% kept, got ${kept / n}")

    // fraction 0 keeps nothing, fraction 1 keeps everything
    assert(Curation.stratifiedSample(docs, "doc_id", "source", Map.empty, 0.0).count() == 0)
    assert(Curation.stratifiedSample(docs, "doc_id", "source", Map.empty, 1.0).count() == n.toLong)
  }

  test("temperature sampling keeps the smallest stratum whole and flattens the mix") {
    val docs = ((1L to 800L).map(i => (i, "big")) ++ (801L to 850L).map(i => (i, "small")))
      .toDF("doc_id", "source")
    val out = Curation.temperatureSample(docs, "doc_id", "source", alpha = 0.5)
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // smallest stratum: keep_frac = 1.0 exactly — every row survives
    assert(bySrc("small") == 50L)
    // big stratum: sqrt(50/800) = 0.25 keep fraction, md5-uniform tolerance
    assert(math.abs(bySrc("big") / 800.0 - 0.25) < 0.08, s"expected ~25% of big, got ${bySrc("big")}")
    // alpha=1 is the natural mix: nothing dropped
    assert(Curation.temperatureSample(docs, "doc_id", "source", alpha = 1.0).count() == 850L)
    // deterministic: same set on re-run
    val again = Curation.temperatureSample(docs, "doc_id", "source", alpha = 0.5)
    assert(out.select("doc_id").collect().toSet == again.select("doc_id").collect().toSet)
  }

  test("stratified sample plans as a pure filter: no shuffle, no RNG") {
    val plan = Curation.stratifiedSample(Tables(spark, sfDir).documents,
      "doc_id", "source", Map("src0" -> 0.5), 0.25).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling must not shuffle:\n$plan")
  }

  test("epochMix materializes floor(w) full copies plus a deterministic partial epoch") {
    val docs = spark.range(2000).select(
      col("id").as("doc_id"),
      concat(lit("s"), pmod(col("id"), lit(4))).as("source"))
    val weights = Map("s0" -> 2.5, "s1" -> 0.25, "s2" -> 0.0)
    val mix = Curation.epochMix(docs, "doc_id", "source", weights, defaultWeight = 1.0, salt = "t")
      .select("doc_id", "source", "epoch").as[(Long, String, Int)].collect()

    // uniqueness of (doc, epoch); dropped stratum absent; default = 1 copy
    assert(mix.length == mix.distinct.length)
    assert(!mix.exists(_._2 == "s2"), "weight-0 stratum must vanish")
    val s3 = mix.filter(_._2 == "s3")
    assert(s3.length == 500 && s3.forall(_._3 == 0), "default weight 1.0 = exactly one epoch-0 copy")

    // w=2.5: every doc at epochs 0 and 1, a strict nonempty subset at 2
    val s0 = mix.filter(_._2 == "s0")
    val s0ByEpoch = s0.groupBy(_._3).view.mapValues(_.map(_._1).toSet).toMap
    assert(s0ByEpoch(0).size == 500 && s0ByEpoch(1).size == 500)
    assert(s0ByEpoch(2).nonEmpty && s0ByEpoch(2).size < 500, "partial epoch must be a strict subset")
    assert((s0.length.toDouble / 500 - 2.5).abs < 0.15, s"s0 realized weight ${s0.length / 500.0}")

    // w=0.25: single partial epoch near a quarter
    val s1 = mix.filter(_._2 == "s1")
    assert(s1.forall(_._3 == 0) && (s1.length.toDouble / 500 - 0.25).abs < 0.1)

    // reproducible row-for-row; a different salt picks a different subset
    val again = Curation.epochMix(docs, "doc_id", "source", weights, defaultWeight = 1.0, salt = "t")
      .select("doc_id", "source", "epoch").as[(Long, String, Int)].collect()
    assert(mix.sorted.toSeq == again.sorted.toSeq)
    val other = Curation.epochMix(docs, "doc_id", "source", weights, defaultWeight = 1.0, salt = "u")
      .select("doc_id", "source", "epoch").as[(Long, String, Int)].collect()
    assert(other.sorted.toSeq != mix.sorted.toSeq, "salt must yield an independent partial epoch")
  }

  test("assignSplits partitions the corpus: exhaustive, deterministic, fraction-tracking, salt-independent") {
    val df = spark.range(20000).toDF("doc_id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = Curation.assignSplits(df, "doc_id", splits, salt = "s1")
    val counts = a.groupBy("split").count().as[(String, Long)].collect().toMap
    // exhaustive partition: every row labeled with a declared split
    assert(counts.keySet == Set("train", "val", "test") && counts.values.sum == 20000L)
    // fraction tracking within the md5-coin's statistical tolerance
    assert(math.abs(counts("train") / 20000.0 - 0.8) < 0.02)
    assert(math.abs(counts("val") / 20000.0 - 0.1) < 0.02)
    // deterministic: same salt → identical assignment; different salt →
    // an independent one (some but not all rows move)
    val b1 = Curation.assignSplits(df, "doc_id", splits, salt = "s1")
    assert(a.except(b1).count() == 0 && b1.except(a).count() == 0)
    val b2 = Curation.assignSplits(df, "doc_id", splits, salt = "s2")
    val moved = a.join(b2, "doc_id")
      .filter(a("split") =!= b2("split")).count()
    assert(moved > 1000 && moved < 20000)
  }

  test("assignSplitsByKey co-assigns exact duplicates: no train/test leakage by construction") {
    val docs = Seq(
      (1L, "the same document text"),
      (2L, "the same document text"),   // exact dup of 1
      (3L, "a different document"),
      (4L, "the same document text"),   // another copy
      (5L, "yet another distinct one")
    ).toDF("doc_id", "text")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val got = Curation.assignSplitsByKey(docs, md5($"text"), splits, salt = "v1")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(got(1L) == got(2L) && got(2L) == got(4L),
      s"all copies of a duplicated document must land in one split: $got")
    // and on the real corpus: every content-hash group maps to exactly one split
    val real = Curation.assignSplitsByKey(
        Tables(spark, sfDir).documents, md5($"text"), splits, salt = "v1")
      .groupBy(md5($"text").as("k")).agg(countDistinct($"split").as("n"))
      .filter($"n" > 1).count()
    assert(real == 0, "a content-hash group straddles splits")
  }

  test("selectByBudget two-phase plan is row-identical to the global cumsum prefix") {
    val docs = Tables(spark, sfDir).documents
    val got = Curation.selectByBudget(docs, "doc_id", "text", budgetTokens = 3000L)
      .select("doc_id").as[Long].collect().toSet
    // the naive global formulation (fine at spec scale)
    val d = Curation.docQualityTokens(docs, "doc_id", "text")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"quality_fp".desc, $"doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val truth = d.withColumn("cum", sum($"n_tokens").over(w))
      .filter($"cum" <= 3000L).select("doc_id").as[Long].collect().toSet
    assert(got == truth,
      s"missing=${truth -- got} extra=${got -- truth}")
    assert(got.nonEmpty, "a 3000-token budget must admit some documents")
    // budget edges: zero budget selects nothing; infinite budget selects all
    assert(Curation.selectByBudget(docs, "doc_id", "text", 0L).count() == 0)
    assert(Curation.selectByBudget(docs, "doc_id", "text", Long.MaxValue / 4).count() == docs.count())
  }

  test("collocations surface a planted phrase above frequent-but-independent pairs") {
    // "san francisco" always co-occurs (perfect collocation); "the cat" /
    // "the dog" share a promiscuous left token, diluting their PMI
    val docs = (
      (1 to 30).map(i => (i.toLong, "san francisco is foggy today number " + (i % 7))) ++
      (31 to 60).map(i => (i.toLong, "the cat sat on mat number " + (i % 7))) ++
      (61 to 90).map(i => (i.toLong, "the dog ran in park number " + (i % 7)))
    ).toDF("doc_id", "text")
    val scored = Curation.collocations(docs, "text", minCount = 5L, k = 100)
      .select("x", "y", "pmi_ratio").as[(String, String, Double)].collect()
      .map { case (x, y, s) => (x, y) -> s }.toMap
    assert(scored(("san", "francisco")) > scored(("the", "cat")) &&
      scored(("san", "francisco")) > scored(("the", "dog")),
      s"the exclusive pair must out-score pairs sharing the promiscuous 'the': $scored")
    // minCount floor: a pair seen fewer than minCount times never appears
    val rare = Curation.collocations(docs, "text", minCount = 31L, k = 100)
      .select("x", "y").as[(String, String)].collect()
    assert(!rare.contains(("san", "francisco")), "count-30 pair must fall under a 31 floor")
  }

  test("mixingManifest caps every stratum at the token budget, keeps small strata whole") {
    val docs = Seq(
      (1L, "one two three four five six seven eight nine ten", "big"),
      (2L, "one two three four five six seven eight nine ten", "big"),
      (3L, "one two three", "small")
    ).toDF("doc_id", "text", "source")
    val m = Curation.mixingManifest(docs, "source", "text", budgetTokens = 10L)
      .orderBy("source").as[(String, Long, Long, Double)].collect().toSeq
    assert(m == Seq(("big", 20L, 2L, 0.5), ("small", 3L, 1L, 1.0)))
  }

  test("keepBestPerCluster keeps the highest-quality doc, smallest id on ties") {
    val docs = Seq(
      (1L, "good clean readable english text with the and of words"),
      (2L, "good clean readable english text with the and of words"), // exact dup of 1
      (3L, "1234567890 !!!???")                                       // unique, low quality
    ).toDF("doc_id", "text")
    val out = Curation.keepBestPerCluster(docs, "doc_id", "text")
      .select("doc_id", "n_copies").as[(Long, Long)].collect().toMap
    assert(out.keySet == Set(1L, 3L), s"one survivor per cluster: $out")
    assert(out(1L) == 2 && out(3L) == 1)
  }

  test("decontamination flags exactly the docs sharing shingles with the benchmark") {
    val bench = Seq((100L, "the secret benchmark question about spark internals")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "something about the secret benchmark question here"), // shares 3-grams
      (2L, "entirely unrelated words nothing in common at all")
    ).toDF("doc_id", "text")
    val hits = Curation.contaminatedDocs(corpus, bench, "doc_id", "text", shingleN = 3)
      .as[Long].collect().toSet
    assert(hits == Set(1L), s"expected only doc 1 flagged, got $hits")
  }

  test("decontamination broadcasts the benchmark side (corpus never shuffles for the join)") {
    val docs = Tables(spark, sfDir).documents
    val plan = Curation.contaminatedDocs(
      docs.filter($"doc_id" >= 20), docs.filter($"doc_id" < 20), "doc_id", "text", 3
    ).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"expected broadcast semi join:\n$plan")
  }

  test("bloom decontamination is a superset of exact with complete recall and no join") {
    val docs  = Tables(spark, sfDir).documents
    val bench = docs.filter($"doc_id" < 20)
    val corp  = docs.filter($"doc_id" >= 20)
    val exact = Curation.contaminatedDocs(corp, bench, "doc_id", "text", 3)
      .as[Long].collect().toSet
    val bloomed = Curation.contaminatedDocsBloom(corp, bench, "doc_id", "text", 3)
      .as[Long].collect().toSet
    // one-sided error: every truly contaminated doc MUST be flagged
    assert(exact.subsetOf(bloomed),
      s"bloom variant missed contaminated docs: ${exact -- bloomed}")
    // at 1% fpp on this corpus the over-flagging should be tiny
    val extras = bloomed -- exact
    assert(extras.size <= math.max(2, exact.size / 10), s"too many false positives: $extras")

    // the corpus side must be a pure scan+filter: no join in the plan at
    // all (the sketch replaces the broadcast semi join)
    val plan = Curation.contaminatedDocsBloom(corp, bench, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"bloom path must not join:\n$plan")
  }

  test("curation pipeline composes quality, repetition, dedup, decontamination, packing") {
    import graft.operators.CurationPipeline
    val docs = Seq(
      (1L, "the quick brown fox jumps over a lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over a lazy dog near the river bank today"), // exact dup of 1
      (3L, "9472 3811 5529 1033 7714 2205 8846 6072"),                             // junk: digits
      (4L, "buy cheap pills buy cheap pills buy cheap pills buy cheap pills"),      // repetitive
      (5L, "the secret benchmark question about spark internals is right here"),    // contaminated
      (6L, "a clean and wholly original document with the usual english words in it")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "the secret benchmark question about spark internals")).toDF("doc_id", "text")

    val out = CurationPipeline.run(docs, "doc_id", "text",
      CurationPipeline.Config(
        minQuality = 0.5,
        maxDup3GramFrac = 0.3,
        compressRatioBounds = Some((0.2, 1.2)), // wide: keeps short prose, cuts nothing here
        maxRareTokenFrac = 1.0,
        dedup = CurationPipeline.ExactDedup,
        decontaminateAgainst = Some(bench),
        tokenBudget = Some(15L)))
    val kept = out.select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 6L),
      s"expected junk/repetitive/dup/contaminated docs removed, got $kept")
    // packing stage attached a sequence id to every survivor
    val seqs = out.select($"doc_id", $"seq_id").as[(Long, Long)].collect().toMap
    assert(seqs.keySet == kept && seqs.values.forall(_ >= 0L))

    // corpus smoke: the full pipeline shrinks but does not empty the
    // real documents table, and survivors meet the quality floor
    val corpus = Tables(spark, sfDir).documents
    val curated = CurationPipeline.run(corpus, "doc_id", "text",
      CurationPipeline.Config(minQuality = 0.2, dedup = CurationPipeline.ExactDedup))
    val n = curated.count()
    assert(n > 0 && n <= corpus.count())
    val minQ = graft.operators.TextAnalysis.qualityScore(curated, "doc_id", "text")
      .agg(org.apache.spark.sql.functions.min($"quality_score")).as[Double].head()
    assert(minQ >= 0.2, s"survivor below the quality floor: $minQ")
  }

  test("vocabTopK returns the k most frequent tokens with deterministic ties") {
    val docs = Seq((1L, "a b b c c c"), (2L, "c d d")).toDF("doc_id", "text")
    val out = Curation.vocabTopK(docs, "text", 3).as[(String, Long)].collect().toSeq
    assert(out == Seq(("c", 4L), ("b", 2L), ("d", 2L)), s"got $out")
  }

  test("packSequences shards by token budget with no unpartitioned window") {
    val docs = Seq(
      (1L, "a b c"), (2L, "d e"), (3L, "f g h i"), (4L, "j"), (5L, "k l m")
    ).toDF("doc_id", "text") // token counts: 3,2,4,1,3 — budget 5 → prefix 0,3,5,9,10
    val out = Curation.packSequences(docs, "doc_id", "text", tokenBudget = 5)
      .select("seq_id", "n_docs", "n_tokens").as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((0L, 2L, 5L), (1L, 2L, 5L), (2L, 1L, 3L)), s"got $out")

    val exec = physicalPlan(
      Curation.packSequences(Tables(spark, sfDir).documents, "doc_id", "text", 2000L))
    // sanity that the traversal sees real operators (the AQE wrapper is a
    // leaf — collecting on it made this assertion vacuous)
    assert(exec.collect { case p => p }.size > 1)
    val globalWindows = exec.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(globalWindows.isEmpty, "weighted numbering must stay partition-parallel")
  }

  test("topKPhysical rejects probe sets over the small-side contract") {
    val e = Tables(spark, sfDir).embeddings
    val ex = intercept[IllegalArgumentException] {
      graft.operators.Similarity.topKPhysical(e, e, "vec_id", "embedding", k = 3, maxProbes = 10)
    }
    assert(ex.getMessage.contains("small-side contract"))
  }

  test("domainTopK: correct per-domain cap, planned with a PARTIAL group limit") {
    val docs = Tables(spark, sfDir).documents
    for (k <- Seq(1, 7)) {
      val kept = Curation.domainTopK(docs, "doc_id", "source", "n_chars", k)
      // per-domain count is capped, and the kept rows are the lexico-best
      val perDomain = kept.groupBy("source").count().as[(String, Long)].collect()
      perDomain.foreach { case (s, n) => assert(n <= k, s"domain $s kept $n > $k") }
      val expected = docs.select("doc_id", "source", "n_chars")
        .as[(Long, String, Long)].collect()
        .groupBy(_._2).values
        .flatMap(_.sortBy(r => (-r._3, r._1)).take(k).map(_._1)).toSet
      assert(kept.select("doc_id").as[Long].collect().toSet == expected)
    }
    // the skew guarantee: Catalyst must plan a PARTIAL WindowGroupLimit
    // below the exchange (map tasks forward ≤ k rows per domain), so a
    // mega-domain never streams its full row count through one reducer
    val plan = physicalPlan(Curation.domainTopK(docs, "doc_id", "source", "n_chars", 5))
    val partials = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
        if w.mode == org.apache.spark.sql.execution.window.Partial => w
    }
    assert(partials.nonEmpty, s"expected a Partial WindowGroupLimit in:\n$plan")
  }

  test("chunkDocuments covers every token, respects overlap, and stays shuffle-free") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "one"),                                    // short doc: one chunk
      (3L, (1 to 4).map(i => s"u$i").mkString(" "))   // exactly chunk width
    ).toDF("doc_id", "text")
    val out = Curation.chunkDocuments(docs, "doc_id", "text", chunkTokens = 4, strideTokens = 3)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 0L, 4L, "t1 t2 t3 t4"), (1L, 1L, 4L, "t4 t5 t6 t7"),
      (1L, 2L, 4L, "t7 t8 t9 t10"), (1L, 3L, 1L, "t10"),
      (2L, 0L, 1L, "one"),
      (3L, 0L, 4L, "u1 u2 u3 u4"), (3L, 1L, 1L, "u4")), s"got $out")

    val plan = physicalPlan(Curation.chunkDocuments(Tables(spark, sfDir).documents, "doc_id", "text", 64, 48))
    val exchanges = plan.collect { case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
    assert(exchanges.isEmpty, "chunking must be a narrow transformation")
  }

  test("csv round-trip is lossless on hostile text (quotes, commas, newlines)") {
    val hostile = Seq(
      (1L, "plain words"),
      (2L, "comma, inside, fields"),
      (3L, "a \"quoted\" phrase"),
      (4L, "line\nbreak and \r\n crlf"),
      (5L, "trailing backslash \\ and \\\" combo"),
      (6L, "")
    ).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_csv_spec").toString + "/docs"
    graft.sources.Csv.write(hostile, tmp)
    val back = graft.sources.Csv.read(spark, tmp, hostile.schema)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    val orig = hostile.orderBy("doc_id").as[(Long, String)].collect().toSeq
    // Spark's CSV writer emits nothing for "" (empty string and null are
    // indistinguishable in CSV); reading yields null — accept that one
    // documented coercion, nothing else
    assert(back.map { case (id, t) => (id, if (t == null) "" else t) } == orig)
  }

  test("classifierScore is a pure map with bounded per-token weights") {
    val out = TextAnalysis.classifierScore(Tables(spark, sfDir).documents, "doc_id", "text")
    val rows = out.as[(Long, Long, Long, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, sum, score, keep) =>
      assert(math.abs(sum) <= 3L * n, "weights live in [-3, 3]")
      assert(math.abs(score) <= 3.0 + 1e-9)
      assert(keep == (score >= 0.0))
    }
    val exchanges = physicalPlan(out).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty, "classifier inference must not shuffle")
  }

  test("exactKPerGroup: bucket-count invariant, exact sizes, matches the one-window form") {
    val docs = Tables(spark, sfDir).documents
    val k    = 5
    val out  = Curation.exactKPerGroup(docs, "doc_id", "source", k, salt = "s")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    // exactly min(k, group size) rows per group, ranks 1..n dense
    val sizes = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.groupBy(_._1).foreach { case (src, rows) =>
      assert(rows.length == math.min(k.toLong, sizes(src)).toInt)
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length))
    }

    // the salted two-phase rewrite changes NO row vs the direct
    // one-window rank, for any bucket count (incl. the degenerate 1)
    val oneWindow = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy(md5(concat(col("doc_id").cast("string"), lit("|s"))), col("doc_id"))
      docs.select(col("source"), col("doc_id"))
        .withColumn("rn", row_number().over(w).cast("long")).where(col("rn") <= k)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    }
    assert(out.toSet == oneWindow)
    val b1 = Curation.exactKPerGroup(docs, "doc_id", "source", k, salt = "s", buckets = 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(b1 == oneWindow)

    // a different salt is an independent resample (manifest changes)
    val resalted = Curation.exactKPerGroup(docs, "doc_id", "source", k, salt = "other")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(resalted != out.map(t => (t._1, t._2)).toSet)

    // scale shape: both ranking windows are PARTITIONED — a hot group
    // never becomes one task's global sort
    val windows = physicalPlan(Curation.exactKPerGroup(docs, "doc_id", "source", k)).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.length == 2, s"expected the two-phase rank, got ${windows.length} windows")
    windows.foreach(w => assert(w.partitionSpec.nonEmpty, "unpartitioned window in exactKPerGroup"))
  }

  test("vocabGrowth counts only never-seen tokens per source, curve is cumulative") {
    val docs = Seq(
      (1L, "a", "x y x"),       // 2 new (x, y)
      (2L, "a", "y z"),         // 1 new (z)
      (3L, "a", "x y z"),       // 0 new — absent from output
      (4L, "b", "x q")          // independent source: 2 new
    ).toDF("doc_id", "source", "text")
    val got = Curation.vocabGrowth(docs, "source", "doc_id", "text")
      .orderBy("source", "doc_id")
      .select("source", "doc_id", "n_new", "vocab_size")
      .as[(String, Long, Long, Long)].collect().toList
    assert(got == List(("a", 1L, 2L, 2L), ("a", 2L, 1L, 3L), ("b", 4L, 2L, 2L)),
      s"growth curve wrong: $got")
  }

  test("sourceNgramOverlap counts distinct shared grams once per pair") {
    val docs = Seq(
      (1L, "a b c d e extra words here", "s1"),
      (2L, "a b c d e and more", "s2"),     // shares gram "a b c d e" with s1
      (3L, "a b c d e again today", "s2"),  // same gram, same source — counted ONCE
      (4L, "nothing in common at all", "s3")
    ).toDF("doc_id", "text", "source")
    val out = Curation.sourceNgramOverlap(docs, "source", "text", n = 5)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(out == Map(("s1", "s2") -> 1L), s"got $out")
  }
}
