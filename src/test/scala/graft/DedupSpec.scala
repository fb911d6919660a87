package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and runs far away today", "s1"),
    (2L, "the quick brown fox jumps over the lazy dog and runs far away tonight", "s1"), // near-dup of 1
    (3L, "completely different content about spark query engines and parquet files", "s1"),
    (4L, "the quick brown fox jumps over the lazy dog and runs far away today", "s2")  // exact dup of 1
  ).toDF("doc_id", "text", "source")

  test("exact dedup groups identical content and keeps the smallest id") {
    val out = Dedup.exact(docs, "doc_id", "text").orderBy("keep_id")
      .select("keep_id", "n_copies").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L), (2L, 1L), (3L, 1L)))
  }

  test("collapsed simhash: exact copies fold to one representative; near-dups survive with group sizes") {
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog and runs far away today", "s"),
      (11L, "the quick brown fox jumps over the lazy dog and runs far away today", "s"), // exact of 10
      (12L, "the quick brown fox jumps over the lazy dog and runs far away today", "s"), // exact of 10
      (20L, "the quick brown fox jumps over the lazy dog and runs far away tonight", "s"), // near-dup
      (30L, "completely different content about spark query engines and parquet files", "s")
    ).toDF("doc_id", "text", "source")

    val pairs = Dedup.simhashNearDupsCollapsed(corpus, "doc_id", "text", maxHamming = 8)
      .select("id_a", "id_b", "n_a", "n_b").as[(Long, Long, Long, Long)].collect().toList

    // the 3-copy group collapses to representative 10; C(3,2)=3
    // intra-group pairs never materialize; the near-dup pair carries
    // the group cardinalities instead
    assert(pairs == List((10L, 20L, 3L, 1L)), s"got $pairs")

    // representative pairs agree with the uncollapsed operator run on
    // the already-distinct corpus
    val distinctCorpus = corpus.filter($"doc_id" isin (10L, 20L, 30L))
    val plain = Dedup.simhashNearDups(distinctCorpus, "doc_id", "text", maxHamming = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toList
    assert(plain == pairs.map(p => (p._1, p._2)))
  }

  test("collapsed minhash: exact copies fold before banding; near-dup pair keeps group sizes") {
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog and runs far away today", "s"),
      (11L, "the quick brown fox jumps over the lazy dog and runs far away today", "s"),
      (12L, "the quick brown fox jumps over the lazy dog and runs far away today", "s"),
      (20L, "the quick brown fox jumps over the lazy dog and runs far away tonight", "s"),
      (30L, "completely different content about spark query engines and parquet files", "s")
    ).toDF("doc_id", "text", "source")
    val pairs = Dedup.minhashNearDupsCollapsed(corpus, "doc_id", "text")
      .select("id_a", "id_b", "n_a", "n_b").as[(Long, Long, Long, Long)].collect().toList
    assert(pairs == List((10L, 20L, 3L, 1L)), s"got $pairs")
  }

  test("containment is asymmetric: a quote inside a long doc scores forward, not backward") {
    val quote = "the quick brown fox jumps over the lazy dog"
    val corpus = Seq(
      (1L, quote, "s1"), // fully contained in 2
      (2L, s"a very long article begins here $quote and then continues with lots of " +
           "unrelated prose about spark engines parquet files and shuffle exchanges", "s1"),
      (3L, "entirely different content on bread dough proofing and oven timings", "s1")
    ).toDF("doc_id", "text", "source")

    val pairs = Dedup.containmentPairs(corpus, "doc_id", "text",
        blockCol = "source", shingleN = 3, threshold = 0.9)
      .select("id_a", "id_b", "containment").as[(Long, Long, Double)].collect().toList

    assert(pairs.map(p => (p._1, p._2)) == List((1L, 2L)),
      s"only quote→container must qualify: $pairs")
    assert(pairs.head._3 == 1.0, s"full containment must score exactly 1.0: $pairs")

    // symmetric Jaccard misses the same pair at any comparable bar: the
    // container's extra shingles dominate the union
    val jac = Dedup.blockedJaccardPairs(corpus, "doc_id", "text",
        blockCol = "source", shingleN = 3, threshold = 0.5)
      .collect()
    assert(jac.isEmpty, "jaccard at 0.5 must NOT see the quote/container pair")
  }

  test("removeRepeatedSpans excises only cross-doc spans and reassembles in order") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon ending one"),
      (2L, "prefix two alpha beta gamma delta epsilon"), // shares the 5-token span with 1
      (3L, "totally unrelated words nothing shared here at all"),
      (4L, "short doc")                                  // below span length: untouched
    ).toDF("doc_id", "text")
    val out = Dedup.removeRepeatedSpans(corpus, "doc_id", "text", spanTokens = 5, minDocs = 2)
      .orderBy("doc_id")
      .as[(Long, String, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "ending one", 2L),
      (2L, "prefix two", 2L),
      (3L, "totally unrelated words nothing shared here at all", 8L),
      (4L, "short doc", 2L)))
  }

  test("removeRepeatedSpans drops fully-excised docs; singleton repeats within one doc survive") {
    val corpus = Seq(
      (1L, "a b c d e"),            // exactly the hot span: fully excised
      (2L, "a b c d e"),            // ditto
      (3L, "x y x y x y x y x y")   // repeats only within itself: minDocs counts DISTINCT docs
    ).toDF("doc_id", "text")
    val out = Dedup.removeRepeatedSpans(corpus, "doc_id", "text", spanTokens = 5, minDocs = 2)
      .orderBy("doc_id")
      .as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((3L, "x y x y x y x y x y", 10L)))
  }

  test("exciseSpans redacts external grams only; clean docs pass through, covered docs drop") {
    val corpus = Seq(
      (1L, "leaked bench span here now plus own words"),
      (2L, "completely clean document text"),
      (3L, "leaked bench span here now")              // nothing but the leak
    ).toDF("doc_id", "text")
    val bench = Seq("leaked bench span here now").toDF("gram")
    val out = Dedup.exciseSpans(corpus, "doc_id", "text", bench, spanTokens = 5)
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "plus own words", 3L),
      (2L, "completely clean document text", 4L)))
  }

  test("spanDupFraction: fully-duplicated docs score 1.0, untouched docs 0.0") {
    val corpus = Seq(
      (1L, "a b c d e"),                    // exactly the hot span: fraction 1.0
      (2L, "a b c d e"),
      (3L, "u v w x y z unrelated tokens"), // no hot span: 0.0
      (4L, "pre a b c d e post")            // 5 of 7 positions covered
    ).toDF("doc_id", "text")
    val out = Dedup.spanDupFraction(corpus, "doc_id", "text", spanTokens = 5, minDocs = 2)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      (1L, 5L, 5L, 1.0), (2L, 5L, 5L, 1.0),
      (3L, 8L, 0L, 0.0), (4L, 7L, 5L, 5.0 / 7.0)))
  }

  test("duplicationWeights: weights within a copy group sum to one; uniques weigh 1.0") {
    val corpus = Seq(
      (1L, "same text"), (2L, "same text"), (3L, "same text"),
      (4L, "unique text")
    ).toDF("doc_id", "text")
    val out = Dedup.duplicationWeights(corpus, "doc_id", "text")
    val perGroup = out.groupBy("content_hash")
      .agg(sum("sample_weight").as("mass"), count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect().toSeq
    assert(perGroup.forall { case (_, mass, _) => math.abs(mass - 1.0) < 1e-12 })
    val unique = out.filter(col("doc_id") === 4L)
      .select("n_copies", "sample_weight").as[(Long, Double)].head()
    assert(unique == ((1L, 1.0)))
  }

  test("incremental span cleaning equals batch output for the delta docs") {
    val corpus = Tables(spark, sfDir).documents.select("doc_id", "text")
    val history = corpus.filter(col("doc_id") % 2 === 0)
    val delta   = corpus.filter(col("doc_id") % 2 === 1)
    val batch = Dedup.removeRepeatedSpans(corpus, "doc_id", "text", spanTokens = 3, minDocs = 2)
      .filter(col("doc_id") % 2 === 1)
      .orderBy("doc_id").collect().toSeq
    val incr = Dedup.removeRepeatedSpansIncremental(
        Dedup.spanIndex(history, "doc_id", "text", spanTokens = 3),
        delta, "doc_id", "text", spanTokens = 3, minDocs = 2)
      .orderBy("doc_id").collect().toSeq
    assert(incr == batch, "index-based delta cleaning must match the batch operator")
  }

  test("index deletion equals a from-scratch rebuild of the survivors (both indexes)") {
    val corpus  = Tables(spark, sfDir).documents.select("doc_id", "text")
    val deleted = corpus.filter(col("doc_id") % 7 === 0)
    val kept    = corpus.filter(col("doc_id") % 7 =!= 0)

    // span index: negative-count merge (the GROUP structure of doc
    // counts) must land exactly on the surviving corpus's own index
    val forgot = Dedup.forgetFromSpanIndex(
        Dedup.spanIndex(corpus, "doc_id", "text", spanTokens = 3),
        deleted, "doc_id", "text", spanTokens = 3)
      .as[(String, Long)].collect().toSet
    val rebuilt = Dedup.spanIndex(kept, "doc_id", "text", spanTokens = 3)
      .as[(String, Long)].collect().toSet
    assert(forgot == rebuilt, "span-index deletion diverged from the survivor rebuild")

    // band index: per-doc rows, so the anti-join must equal the rebuild
    val bForgot = Dedup.forgetFromBandIndex(
        Dedup.bandIndex(corpus, "doc_id", "text"), deleted.select("doc_id"), "doc_id")
      .as[(Long, Int, Long)].collect().toSet
    val bRebuilt = Dedup.bandIndex(kept, "doc_id", "text")
      .as[(Long, Int, Long)].collect().toSet
    assert(bForgot == bRebuilt, "band-index deletion diverged from the survivor rebuild")
  }

  test("edit-distance pairs (segment blocking) match brute force exactly, incl. hand-checked dists") {
    // full-recall claim on the real corpus: the blocked join must equal
    // the all-pairs baseline pair-for-pair AND distance-for-distance
    val titles = Tables(spark, sfDir).documents
      .select(col("doc_id"), substring(col("text"), 1, 14).as("title"))
    val blocked = Dedup.editDistancePairs(titles, "doc_id", "title", maxDist = 3)
      .as[(Long, Long, Int)].collect().toSet
    val t = titles.select(col("doc_id").as("id"), col("title").as("t"))
    val brute = t.as("a").join(t.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"), levenshtein(col("a.t"), col("b.t")).as("d"))
      .filter(col("d") <= 3).as[(Long, Long, Int)].collect().toSet
    assert(brute.nonEmpty, "corpus should contain near-title pairs at d=3")
    assert(blocked == brute, "segment blocking lost or invented pairs vs brute force")

    // hand-checked distances, exact dups, and the empty-string edge
    val toy = Seq((1L, "kitten"), (2L, "sitting"), (3L, "kitten"), (4L, ""), (5L, "a"))
      .toDF("id", "s")
    val pairs = Dedup.editDistancePairs(toy, "id", "s", maxDist = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs == Set((1L, 2L, 3), (1L, 3L, 0), (2L, 3L, 3), (4L, 5L, 1)),
      s"hand-checked edit distances wrong: $pairs")
  }

  test("minhash LSH finds near- and exact-dup pairs, not unrelated docs") {
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "near-dup pair missed")
    assert(pairs.contains((1L, 4L)), "exact-dup pair missed")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "false positive on unrelated doc")
  }

  test("minhash LSH recall equals brute force on the real corpus") {
    val real = Tables(spark, sfDir).documents
    // ground truth: same-source brute-force pairs with jaccard >= 0.7
    val keys = real.select($"doc_id", $"source")
    val candidates = keys.as("a").join(keys.as("b"),
        $"a.source" === $"b.source" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"))
    val truth = Dedup.jaccardForPairs(candidates, real, "doc_id", "text", 3)
      .filter($"jaccard" >= 0.7).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val found = Dedup.minhashNearDups(real, "doc_id", "text", threshold = 0.7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty, "test corpus should contain planted near-dups")
    assert(truth.subsetOf(found), s"LSH missed ${truth.diff(found)}")
  }

  test("simhash fingerprints of near-dups are close, unrelated are far") {
    val fp = Dedup.withSimhash(docs, "text").select("doc_id", "simhash")
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(4L), "identical text must produce identical simhash")
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(fp(1L), fp(2L)) < hamming(fp(1L), fp(3L)),
      "near-dup must be closer than unrelated doc")
  }

  test("simhash near-dup join returns the exact-dup pair") {
    val pairs = Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)))
  }

  test("simhash blocking recall is 1.0 vs brute-force hamming at maxHamming=8") {
    // corpus engineered to land pairs across the whole 0..8 hamming range:
    // a base doc plus variants with 0..12 substituted tokens — simhash
    // distances grow with the perturbation count, so the brute-force
    // truth set contains pairs at the distances (4..8) that the old
    // 4-chunk blocking silently dropped
    val base = (0 until 40).map(i => s"tok$i")
    val variants = (0 to 24).map { k =>
      val toks = base.zipWithIndex.map { case (t, i) => if (i < k) s"sub${k}_$i" else t }
      (k.toLong, toks.mkString(" "), "s1")
    }
    val corpus = variants.toDF("doc_id", "text", "source")

    val maxHamming = 8
    // ground truth: all-pairs hamming over the actual fingerprints
    val fp = Dedup.withSimhash(corpus, "text").select($"doc_id", $"simhash")
    val truth = fp.as("a").join(fp.as("b"), $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"),
        expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
      .filter($"hamming" <= maxHamming)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect()

    val truthPairs = truth.map(t => (t._1, t._2)).toSet
    val distances  = truth.map(_._3).toSet
    assert(distances.exists(d => d >= 4 && d <= 8),
      s"corpus must contain pairs at hamming 4..8 to be probative (got $distances)")

    val found = Dedup.simhashNearDups(corpus, "doc_id", "text", maxHamming = maxHamming)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(found == truthPairs,
      s"blocking must be exhaustive: missed ${truthPairs.diff(found)}, extra ${found.diff(truthPairs)}")
  }

  test("simhash chunk split covers all 64 bits disjointly for any maxHamming") {
    // the chunk values must reconstruct the fingerprint: if chunks
    // overlapped or missed bits, pigeonhole completeness would break
    for (mh <- Seq(0, 3, 7, 8, 31, 63)) {
      val n = mh + 1
      val out = Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = mh)
      assert(out.columns.toSet == Set("id_a", "id_b", "hamming"))
      val widths = Array.tabulate(n)(c => if (c < 64 % n) 64 / n + 1 else 64 / n)
      assert(widths.sum == 64, s"chunks for maxHamming=$mh must cover 64 bits")
    }
  }
}
