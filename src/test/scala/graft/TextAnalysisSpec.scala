package graft

import graft.operators.{Multimodal, TextAnalysis}
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token stats on a crafted document") {
    val df  = Seq((1L, "alpha  beta alpha\tgamma")).toDF("doc_id", "text")
    val row = TextAnalysis.tokenStats(df, "doc_id", "text").head()
    assert(row.getAs[Long]("n_tokens") == 4L)
    assert(row.getAs[Long]("n_unique_tokens") == 3L)
  }

  test("repetition profile flags boilerplate and tolerates 1-token docs") {
    val df = Seq(
      (1L, "buy cheap pills buy cheap pills buy cheap pills buy cheap pills"),
      (2L, "the quick brown fox jumps over a lazy dog near the river bank"),
      (3L, "x") // fewer tokens than any shingle width — must not crash
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionProfile(df, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // 12 tokens, 3 distinct -> dup_word_frac 0.75; 2-grams all repeats of 3
    assert(out(1L).getAs[Boolean]("is_repetitive"))
    assert(out(1L).getAs[Double]("dup_word_frac") == 0.75)
    assert(out(1L).getAs[Double]("dup_2gram_frac") > 0.6)
    assert(!out(2L).getAs[Boolean]("is_repetitive"))
    assert(out(3L).getAs[Double]("dup_2gram_frac") == 0.0)
    assert(out(3L).getAs[Double]("dup_3gram_frac") == 0.0)
  }

  test("keyword extraction ranks corpus-distinctive tokens first") {
    val df = Seq(
      (1L, "spark spark spark common common"),
      (2L, "duck duck common common common"),
      (3L, "common common goose")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.keywords(df, "doc_id", "text", k = 2)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("rank")) -> r.getAs[String]("token")).toMap
    // "common" appears in every doc (df=3) so the doc-exclusive token wins rank 1
    assert(out((1L, 1)) == "spark")
    assert(out((2L, 1)) == "duck")
    assert(out((3L, 1)) == "goose")
    assert(out((1L, 2)) == "common")
  }

  test("gopher rules pass clean prose and fail short/symbol-heavy/alpha-poor docs") {
    val prose = (("the quick brown fox jumps over the lazy dog and runs far away " * 5) +
      "that dogs have fun with many other dogs every single day").trim
    val df = Seq(
      (1L, prose),                                    // passes everything
      (2L, "too short to pass the word count rule"),  // fails words_ok
      (3L, ("### " * 40 + "the of and that have with be to " * 10).trim), // symbol-heavy
      (4L, ("1 2 3 4 5 6 7 8 9 0 " * 10).trim)        // alpha-poor, no stopwords
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(df, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("passes_gopher"))
    assert(!out(2L).getAs[Boolean]("words_ok"))
    assert(!out(3L).getAs[Boolean]("symbols_ok"))
    assert(!out(4L).getAs[Boolean]("alpha_ok") && !out(4L).getAs[Boolean]("stopwords_ok"))
  }

  test("pii scrub masks urls, emails, and long digit runs with exact counts") {
    val df = Seq(
      (1L, "mail me at jane.doe+spam@example.co.uk or visit https://example.com/a?b=c#d today"),
      (2L, "account 12345678 and phone 5551234567 but keep 123456 short"),
      (3L, "nothing sensitive here")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.scrubPii(df, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("scrubbed") == "mail me at <EMAIL> or visit <URL> today")
    assert(out(1L).getAs[Long]("n_emails") == 1L && out(1L).getAs[Long]("n_urls") == 1L)
    assert(out(2L).getAs[String]("scrubbed") == "account <NUM> and phone <NUM> but keep 123456 short")
    assert(out(2L).getAs[Long]("n_digit_runs") == 2L)
    assert(out(3L).getAs[String]("scrubbed") == "nothing sensitive here")
    assert(out(3L).getAs[Long]("n_emails") + out(3L).getAs[Long]("n_urls") + out(3L).getAs[Long]("n_digit_runs") == 0L)
  }

  test("length outliers flag only rows outside the percentile band") {
    val df = (1L to 99L).map(i => (i, 100L)).toDF("doc_id", "n_chars")
      .union(Seq((100L, 1L), (101L, 100000L)).toDF("doc_id", "n_chars"))
    val out = graft.operators.Curation.lengthOutliers(df, "doc_id", "n_chars")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(out == Set(100L, 101L))
  }

  test("word shingles on docs shorter than the shingle width are empty, not an error") {
    import graft.functions.TextFunctions
    val df = Seq((1L, "one"), (2L, "one two"), (3L, "one two three")).toDF("doc_id", "text")
    val out = df.select($"doc_id", TextFunctions.wordShingles($"text", 3).as("g"))
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L).isEmpty && out(2L).isEmpty)
    assert(out(3L) == Seq("one two three"))
  }

  test("deflate ratio orders boilerplate below prose below random text") {
    import graft.plans.TextVectorExpressions.deflateRatio
    val boiler = "click here to subscribe " * 40
    val prose = "the quick brown fox jumps over a lazy dog while the river flows " +
      "quietly past the old mill and children play in the warm afternoon sun nearby"
    val noise = scala.util.Random.javaRandomToRandom(new java.util.Random(42))
      .alphanumeric.take(600).mkString
    val out = Seq((1L, boiler), (2L, prose), (3L, noise), (4L, ""))
      .toDF("doc_id", "text")
      .select($"doc_id", deflateRatio($"text").as("r"))
      .as[(Long, Double)].collect().toMap
    assert(out(1L) < 0.2, s"boilerplate must compress hard: ${out(1L)}")
    assert(out(1L) < out(2L) && out(2L) < out(3L), s"ordering violated: $out")
    assert(out(4L) == 1.0, "empty text is defined as ratio 1.0")
  }

  test("rarity profile separates gibberish from common prose") {
    val df = Seq(
      (1L, "the the the cat cat sat"),      // all tokens corpus-common
      (2L, "xqzv bnmp wkrt the cat"),       // 3 of 5 tokens are corpus-unique
      (3L, "the cat sat"),
      (4L, "the cat sat")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.rarityProfile(df, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(2L).getAs[Double]("rare_token_frac") == 0.6, s"gibberish share: ${out(2L)}")
    assert(out(1L).getAs[Double]("rare_token_frac") == 0.0)
    // mean_token_freq: doc 1's tokens are frequent ("the" x6 in corpus)
    assert(out(1L).getAs[Double]("mean_token_freq") > out(2L).getAs[Double]("mean_token_freq"))
  }

  test("langId classifies handcrafted sentences") {
    val df = Seq(
      (1L, "the cat is in the house and it was good for the family"),
      (2L, "el gato es un animal que vive en la casa de los abuelos"),
      (3L, "der hund ist ein tier und das haus ist nicht klein mit den"),
      (4L, "le chien est un animal dans les maisons et la ville des gens"),
      (5L, "这是一个中文句子 关于大数据处理 和查询引擎")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.langId(df, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "en", 2L -> "es", 3L -> "de", 4L -> "fr", 5L -> "zh"))
  }

  test("quality score rewards clean prose and penalizes digit noise") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog in a calm field"),
      (2L, "x9 3342 998 001 2383 44 9 11 000 993 111 222 3 4")
    ).toDF("doc_id", "text")
    val scores = TextAnalysis.qualityScore(df, "doc_id", "text")
      .select("doc_id", "quality_score").as[(Long, Double)].collect().toMap
    assert(scores(1L) > scores(2L) + 0.3, s"unexpected scores: $scores")
  }

  test("winnowing fingerprints overlap heavily for near-dups only") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs far away today"),
      (2L, "the quick brown fox jumps over the lazy dog and runs far away tonight"),
      (3L, "completely different content about spark query engines and parquet files")
    ).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowingFingerprints(df, "doc_id", "text")
      .select("doc_id", "fingerprints").as[(Long, Seq[Long])].collect().toMap
      .view.mapValues(_.toSet).toMap
    def overlap(a: Set[Long], b: Set[Long]) = a.intersect(b).size.toDouble / a.union(b).size
    assert(overlap(fps(1L), fps(2L)) > 0.7)
    assert(overlap(fps(1L), fps(3L)) < 0.2)
  }

  test("ngram LM coverage: in-distribution text scores high, out-of-distribution low") {
    // bigram model from the corpus itself, minCount=2: "the quick fox"
    // bigrams appear in docs 1..3 (model), doc 4 is noise (every bigram
    // unique → zero coverage)
    val df = Seq(
      (1L, "the quick fox jumps"),
      (2L, "the quick fox sleeps"),
      (3L, "the quick fox jumps"),
      (4L, "zx qv wk pj")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.ngramLmScore(df, "doc_id", "text", n = 2, minCount = 2L)
      .orderBy("doc_id")
      .select("doc_id", "n_ngrams", "n_covered", "coverage")
      .as[(Long, Long, Long, Double)].collect().toList
    // model bigrams: "the quick"(3) "quick fox"(3) "fox jumps"(2);
    // doc1: 3/3 covered, doc2: 2/3 ("fox sleeps" count 1), doc4: 0/3
    assert(got == List((1L, 3L, 3L, 1.0), (2L, 3L, 2L, 2.0 / 3), (3L, 3L, 3L, 1.0), (4L, 3L, 0L, 0.0)),
      s"coverage wrong: $got")
    val mean = TextAnalysis.ngramLmScore(df, "doc_id", "text", n = 2, minCount = 2L)
      .filter($"doc_id" === 1L).select("mean_model_count").as[Double].head()
    assert(mean == (3.0 + 3.0 + 2.0) / 3, s"mean model count wrong: $mean")
  }

  test("tfidf retrieval ranks the near-duplicate first and never returns the probe itself") {
    val df = Seq(
      (0L, "spark query engine with catalyst optimizer and tungsten"),
      (1L, "spark query engine with catalyst optimizer and codegen"), // near-dup of 0
      (2L, "a completely unrelated cooking recipe about bread dough"),
      (3L, "spark catalyst notes"),                                   // partial overlap
      (4L, "bread dough proofing and baking times explained")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopK(df, "doc_id", "text", probeIds = Seq(0L), k = 3)
      .orderBy("rank").select("doc_id", "sim").as[(Long, Double)].collect().toList
    assert(got.map(_._1).head == 1L, s"near-dup should rank first: $got")
    assert(!got.map(_._1).contains(0L), "probe must not retrieve itself")
    assert(got.map(_._2) == got.map(_._2).sorted.reverse && got.head._2 > 0.5,
      s"similarities must descend from a high near-dup score: $got")
  }

  test("normalize_text canonicalizes case, whitespace, and Unicode composition") {
    import graft.plans.TextVectorExpressions.normalizeText
    val cafeNfd = "Café"   // e + combining acute (decomposed)
    val cafeNfc = "café"    // precomposed é, lowercased
    val rows = Seq(
      (1L, "  Hello   World  "),
      (2L, "hello world"),
      (3L, cafeNfd + "  MENU"),
      (4L, cafeNfc + " menu"),
      (5L, "tabs\tand\nnewlines\r\ncollapse"),
      (6L, "")
    ).toDF("doc_id", "text")
    val got = rows.select($"doc_id", normalizeText($"text").as("n"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "hello world" && got(1L) == got(2L),
      s"case + whitespace drift must canonicalize: '${got(1L)}'")
    assert(got(3L) == got(4L) && got(3L) == cafeNfc + " menu",
      s"decomposed and precomposed accents must meet at NFC: '${got(3L)}' vs '${got(4L)}'")
    assert(got(5L) == "tabs and newlines collapse")
    assert(got(6L) == "")
    // the SQL surface agrees with the Column helper
    rows.createOrReplaceTempView("norm_in")
    val viaSql = spark.sql("SELECT doc_id, normalize_text(text) AS n FROM norm_in")
      .as[(Long, String)].collect().toMap
    assert(viaSql == got)
  }

  test("bm25 ranks the near-duplicate first, never self-retrieves, and saturates tf") {
    val df = Seq(
      (0L, "spark query engine with catalyst optimizer and tungsten"),
      (1L, "spark query engine with catalyst optimizer and codegen"), // near-dup of 0
      (2L, "a completely unrelated cooking recipe about bread dough"),
      (3L, "spark catalyst notes"),
      (4L, "bread dough proofing and baking times explained")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(df, "doc_id", "text", probeIds = Seq(0L), k = 3)
      .orderBy("rank").select("doc_id", "score").as[(Long, Double)].collect().toList
    assert(got.map(_._1).head == 1L, s"near-dup should rank first: $got")
    assert(!got.map(_._1).contains(0L), "probe must not retrieve itself")
    assert(got.map(_._2) == got.map(_._2).sorted.reverse, s"scores must descend: $got")

    // tf saturation: repeating a matched term inflates the score
    // sub-linearly — doc 10 (term once) vs doc 11 (term five times)
    // must score within the k1+1 = 2.2x saturation ceiling, not 5x
    val sat = Seq(
      (9L, "needle haystack"),
      (10L, "needle filler filler filler filler"),
      (11L, "needle needle needle needle needle")
    ).toDF("doc_id", "text")
    val s = TextAnalysis.bm25TopK(sat, "doc_id", "text", probeIds = Seq(9L), k = 2)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(s(11L) / s(10L) < 2.2, s"tf must saturate below k1+1: $s")
  }

  test("bm25 fixed point matches an in-memory reference on the real corpus") {
    val docs = Tables(spark, sfDir).documents.limit(60)
      .select("doc_id", "text").as[(Long, String)].collect().toList
    val toks = docs.map { case (id, t) => id -> t.trim.split("\\s+").filter(_.nonEmpty).toList }
    val tf   = toks.map { case (id, ws) => id -> ws.groupBy(identity).view.mapValues(_.size.toLong).toMap }
    val dl   = tf.map { case (id, m) => id -> m.values.sum }.toMap
    val n    = dl.size.toLong
    val avg  = 100L * dl.values.sum / n
    val dfq  = tf.flatMap(_._2.keys).groupBy(identity).view.mapValues(_.size.toLong).toMap
    def idfFp(t: String) = (2 * n - 2 * dfq(t) + 1) * 1000L / (2 * dfq(t) + 1)
    def satFp(f: Long, d: Long) = 22L * f * avg * 10000L / (10L * f * avg + 3L * avg + 900L * d)
    val probe = tf.head
    val expected = tf.tail.map { case (id, m) =>
      // .toList first: keys is a Set, and two terms with EQUAL idf·sat
      // products would otherwise collapse to one before the sum
      id -> probe._2.keys.toList.collect {
        case t if m.contains(t) => idfFp(t) * satFp(m(t), dl(id))
      }.sum
    }.filter(_._2 > 0).sortBy { case (id, s) => (-s, id) }.take(5)
      .zipWithIndex.map { case ((id, s), i) => (i + 1, id, s / 1.0e7) }

    val small = spark.createDataFrame(docs).toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(small, "doc_id", "text", probeIds = Seq(probe._1), k = 5)
      .orderBy("rank").select("rank", "doc_id", "score")
      .as[(Int, Long, Double)].collect().toList
    assert(got == expected, s"fixed-point BM25 must match the reference fold:\n$got\n$expected")
  }

  test("hybrid RRF: consensus beats single-list winners, partial lists still compete") {
    // doc 1 is the lexical near-dup of the probe; doc 2 is the dense
    // nearest neighbor; doc 3 is #2 on BOTH lists. RRF's whole point:
    // 2/(60+2) > 1/(60+1), so the consensus doc must win the fusion.
    val docs = Seq(
      (0L, "spark query engine with catalyst optimizer and tungsten"),
      (1L, "spark query engine with catalyst optimizer and codegen"),
      (2L, "a completely unrelated cooking recipe about bread dough"),
      (3L, "spark catalyst engine notes and tungsten internals")
    ).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.99f, 0.1f, 0.0f)),  // dense #1
      (3L, Array(0.9f, 0.3f, 0.0f))    // dense #2
      // doc 1 has no embedding: lexical-only candidate
    ).toDF("vec_id", "embedding")
    val got = TextAnalysis.hybridRrfTopK(docs, emb, "doc_id", "text", "vec_id", "embedding",
        probeIds = Seq(0L), depth = 3, k = 3)
      .orderBy("rank").select("doc_id", "rrf_fp").as[(Long, Long)].collect().toList

    assert(got.map(_._1).head == 3L, s"two-list consensus must out-fuse single-list #1s: $got")
    assert(!got.map(_._1).contains(0L), "probe must not retrieve itself")
    assert(got.map(_._1).toSet == Set(1L, 2L, 3L), s"partial-list docs must still compete: $got")
    // fixed-point fusion is exact integer math: doc 3 = lex#2 + den#2
    val expected3 = 1000000L / 62 + 1000000L / 62
    assert(got.toMap.apply(3L) == expected3, s"rrf_fp must be exact: $got")
  }

  test("aho-corasick counts every occurrence: overlaps, nested needles, dict-suffix chains") {
    def naive(s: String, needle: String): Long =
      (0 to s.length - needle.length).count(i => s.startsWith(needle, i)).toLong
    // the classic AC stress set: needles that are suffixes of each other
    // ("hers" ends "s"→"hers", dict chain hits "he"+"hers" at once) plus
    // a self-overlapping needle ("aba" in "ababa" = 2, replace-counting
    // would say 1 — the expression must count ALL positions)
    val needles = Seq("he", "she", "his", "hers", "aba")
    val texts = Seq("ushers", "shehehis", "ababa", "", "hhhh", "ahishers")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        graft.plans.TextVectorExpressions.multiPatternCounts(col("text"), needles).as("c"))
      .as[(Long, Seq[Long])].collect().toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val expect = needles.map(naive(t, _))
      assert(got(i.toLong) == expect, s"text '$t': got ${got(i.toLong)}, want $expect")
    }
  }

  test("aho-corasick equals the naive scan on random strings (property)") {
    val rnd = new scala.util.Random(42)
    val needles = Seq("ab", "ba", "aab", "bba", "abab", "b")
    def naive(s: String, needle: String): Long =
      (0 to s.length - needle.length).count(i => s.startsWith(needle, i)).toLong
    val texts = (0 until 200).map(i =>
      (i.toLong, (0 until rnd.nextInt(40)).map(_ => if (rnd.nextBoolean()) 'a' else 'b').mkString))
    val got = texts.toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.plans.TextVectorExpressions.multiPatternCounts(col("text"), needles).as("c"))
      .as[(Long, Seq[Long])].collect().toMap
    texts.foreach { case (id, t) =>
      assert(got(id) == needles.map(naive(t, _)), s"mismatch on '$t'")
    }
  }

  test("multiMatch totals and coverage derive from one kernel pass") {
    val df = Seq((1L, "spark merge spark"), (2L, "nothing here"), (3L, "batch stream merge"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.multiMatch(df, "doc_id", "text",
        Seq("spark", "merge", "batch stream"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 3L, 2L), (2L, 0L, 0L), (3L, 2L, 2L)), s"got $out")
  }

  test("frame sampling keeps every Nth frame with per-frame features") {
    val docs  = Seq((1L, "x" * 100)).toDF("doc_id", "text")
    val media = Multimodal.synthesizePayloads(docs, "doc_id", "text")
    val out   = Multimodal.sampleFrames(spark, media, frameBytes = 10, stride = 3).head()
    assert(out.n_frames_total == 10)
    assert(out.sampled_frames.toSeq == Seq(0, 3, 6, 9))
    assert(out.frame_features.length == 4 && out.frame_features.forall(_.length == 16))
  }

  test("multimodal feature extraction is deterministic with normalized histograms") {
    val docs  = Seq((1L, "some payload text"), (2L, "other bytes here")).toDF("doc_id", "text")
    val media = Multimodal.synthesizePayloads(docs, "doc_id", "text")
    assert(media.schema("payload").dataType.typeName == "binary")
    val feats = Multimodal.extractFeatures(spark, media).collect().sortBy(_.doc_id)
    assert(feats.length == 2)
    assert(feats.forall(f => f.features.length == 16 && math.abs(f.features.sum - 1.0) < 1e-9))
    val again = Multimodal.extractFeatures(spark, media).collect().sortBy(_.doc_id)
    assert(feats.map(_.features.toSeq).toSeq == again.map(_.features.toSeq).toSeq)
  }
}
