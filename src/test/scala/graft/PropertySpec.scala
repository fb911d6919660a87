package graft

import graft.operators.{MergeInto, SchemaMigration, Upsert}
import graft.streaming.TokenBucket
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Algebraic invariants of the core operators on ScalaCheck-generated
  * inputs (seeded sampling — deterministic; no scalatestplus bridge in
  * this environment). Small cases since each is a Spark round trip, but
  * adversarial shapes: duplicate keys, empty sides, version ties.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] = {
    var seed = Seed(42L)
    (1 to n).flatMap { _ =>
      val a = gen.apply(Gen.Parameters.default.withSize(12), seed)
      seed = seed.next
      a
    }
  }

  private val rowsGen: Gen[List[(Int, Int, String)]] =
    Gen.listOf(for {
      k <- Gen.choose(0, 5)
      v <- Gen.choose(0, 4)
      p <- Gen.alphaStr.map(_.take(4))
    } yield (k, v, p))

  test("ProximityAnchors/SpanNearCount agree with brute-force references on random position sets") {
    import org.apache.spark.sql.functions.col

    // brute-force references: the definitions, evaluated the slow way
    def refProx(pa: Seq[Int], pb: Seq[Int], w: Int): Long =
      pa.count(p => pb.exists(q => q > p && q - p <= w)).toLong
    def refOrdered(pos: Seq[Seq[Int]], slop: Int): Long = {
      def chain(prev: Int, rest: Seq[Seq[Int]]): Option[Int] = rest match {
        case Nil => Some(prev)
        case h +: t => h.find(_ > prev).flatMap(q => chain(q, t))
      }
      pos.head.count(p1 =>
        chain(p1, pos.tail).exists(pk => pk - p1 - (pos.size - 1) <= slop)).toLong
    }
    def refUnordered(pos: Seq[Seq[Int]], slop: Int): Long = {
      val w = slop + pos.size - 1
      pos.flatten.distinct.count(m =>
        pos.forall(_.exists(q => q >= m && q <= m + w))).toLong
    }

    val posGen = Gen.listOf(Gen.choose(0, 30)).map(_.distinct.sorted)
    val windowGen = Gen.choose(1, 6)

    // pair kernel vs reference
    val pairCases = samples(Gen.zip(posGen, posGen, windowGen), 60)
      .filter { case (a, b, _) => a.nonEmpty && b.nonEmpty }
    for (w <- pairCases.map(_._3).distinct) {
      val cases = pairCases.filter(_._3 == w)
      val got = cases.map(c => (c._1, c._2)).toDF("pa", "pb")
        .select(graft.plans.SpanNearCount.proximityAnchors(col("pa"), col("pb"), w))
        .collect().map(_.getLong(0)).toSeq
      assert(got == cases.map(c => refProx(c._1, c._2, w)),
        s"ProximityAnchors diverged from brute force at window=$w")
    }

    // k-term kernel vs references, both modes, k in 1..4
    val kGen = for {
      k <- Gen.choose(1, 4)
      arrays <- Gen.listOfN(k, posGen.map(_.take(8)))
      slop <- Gen.choose(0, 5)
    } yield (arrays, slop)
    val spanCases = samples(kGen, 80).filter(_._1.forall(_.nonEmpty))
    for (inOrder <- Seq(true, false); slop <- spanCases.map(_._2).distinct) {
      val cases = spanCases.filter(_._2 == slop)
      val got = cases.map(c => Tuple1(c._1)).toDF("pos")
        .select(graft.plans.SpanNearCount.spanNear(col("pos"), slop, inOrder))
        .collect().map(_.getLong(0)).toSeq
      val want = cases.map(c =>
        if (inOrder) refOrdered(c._1, slop) else refUnordered(c._1, slop))
      assert(got == want,
        s"SpanNearCount(inOrder=$inOrder, slop=$slop) diverged from brute force: " +
          cases.zip(got.zip(want)).collectFirst {
            case ((arr, _), (g, e)) if g != e => s"$arr -> got $g want $e"
          }.getOrElse(""))
    }
  }

  test("SortedIntersect/SortedJaccard agree with set algebra on random sorted arrays") {
    import graft.plans.TextVectorExpressions
    import org.apache.spark.sql.functions.col
    val arrGen = Gen.listOf(Gen.choose(0L, 40L)).map(_.distinct.sorted)
    val pairs = samples(Gen.zip(arrGen, arrGen), 60)
    val df = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        TextVectorExpressions.sortedIntersect(col("a"), col("b")).as("inter"),
        TextVectorExpressions.sortedJaccard(col("a"), col("b")).as("jac"))
    df.collect().foreach { r =>
      val a = r.getSeq[Long](0).toSet
      val b = r.getSeq[Long](1).toSet
      val inter = r.getLong(2)
      assert(inter == (a & b).size.toLong, s"intersect mismatch on $a / $b")
      val jac = r.getDouble(3)
      if (a.isEmpty && b.isEmpty) assert(jac.isNaN)
      else {
        // the kernel's own identity: |∩| / (n + m - |∩|) as one double division
        assert(jac == inter.toDouble / (a.size + b.size - inter).toDouble,
          s"jaccard must equal inter/union on $a / $b")
      }
    }
  }

  test("Upsert: one row per key, winner is the max (version, tiebreak) of its key") {
    for (rows <- samples(rowsGen, 8) if rows.nonEmpty) {
      val df  = rows.toDF("k", "v", "p")
      val out = Upsert.latestByKey(df, Seq("k"), Seq("v", "p")).collect()
      assert(out.length == rows.map(_._1).distinct.length)
      val inSet = rows.toSet
      assert(out.forall(r => inSet.contains((r.getInt(0), r.getInt(1), r.getString(2)))))
      out.foreach { r =>
        val best = rows.filter(_._1 == r.getInt(0)).map(t => (t._2, t._3)).max
        assert((r.getInt(1), r.getString(2)) == best)
      }
    }
  }

  test("MergeInto: keys = union, source always wins on overlap") {
    val pairs = samples(rowsGen, 8).grouped(2).collect { case Seq(a, b) => (a, b) }.toSeq
    for ((t, s) <- pairs) {
      val target = t.distinctBy(_._1).toDF("k", "v", "p")
      val source = s.distinctBy(_._1).toDF("k", "v", "p")
      val out    = MergeInto.merge(target, source, Seq("k")).collect()
      assert(out.map(_.getInt(0)).toSet == t.map(_._1).toSet.union(s.map(_._1).toSet))
      val sMap = s.distinctBy(_._1).map(r => r._1 -> r).toMap
      out.foreach { r =>
        sMap.get(r.getInt(0)).foreach { src =>
          assert((r.getInt(1), r.getString(2)) == ((src._2, src._3)), "source row must win")
        }
      }
    }
  }

  test("SchemaMigration: row count preserved, columns are the union") {
    for ((nOld, nNew) <- samples(Gen.zip(Gen.choose(0, 6), Gen.choose(0, 6)), 6)) {
      val oldDf = (1 to nOld).map(i => (i, s"o$i")).toDF("k", "a")
      val newDf = (1 to nNew).map(i => (i, i.toLong, s"n$i")).toDF("k", "b", "c")
      val out   = SchemaMigration.migrate(oldDf, newDf)
      assert(out.columns.toSet == Set("k", "a", "b", "c"))
      assert(out.count() == nOld + nNew)
    }
  }

  test("resolveSurvivors: one survivor per connected component on random graphs") {
    // oracle: plain union-find over the generated edges — independent of
    // the Spark propagation, and includes deep chains whose diameter
    // exercises the iteration loop well past typical near-dup clusters
    val edgesGen: Gen[List[(Long, Long)]] = Gen.listOf(for {
      a <- Gen.choose(0L, 29L); b <- Gen.choose(0L, 29L) if a != b
    } yield (math.min(a, b), math.max(a, b)))

    val chain = (0L until 25L).sliding(2).map(s => (s(0), s(1))).toList // diameter 24
    for (edges <- samples(edgesGen, 8).map(_.distinct) :+ chain) {
      val parent = Array.tabulate(30)(identity)
      def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) => parent(find(a.toInt)) = find(b.toInt) }
      val expectedSurvivors = (0 until 30).groupBy(find).values.map(_.min.toLong).toSet

      val docs  = (0L until 30L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
      val pairs = edges.toDF("id_a", "id_b")
      val got = graft.operators.Dedup.resolveSurvivors(docs, pairs, "doc_id")
        .select("doc_id").as[Long].collect().toSet
      assert(got == expectedSurvivors, s"edges=$edges")
    }
  }

  test("NGramProfile kernel equals the split/distinct reference on random text") {
    // texts with repeats, multi-space runs, leading/trailing spaces,
    // unicode, and sub-width docs — everything the kernel special-cases
    val textGen: Gen[String] = Gen.listOf(Gen.oneOf(
      "the", "the", "fox", "über", "1", "a b", " ", "", "日本"
    )).map(_.mkString(" "))
    for (text <- samples(textGen, 30)) {
      val out = Seq((1L, text)).toDF("id", "text")
        .select(graft.plans.TextVectorExpressions.ngramProfile(
          org.apache.spark.sql.functions.col("text"), Seq(1, 2, 3)))
        .as[Seq[Long]].head()
      // reference: same trim + \s+ split, grams joined by one space
      val toks = text.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse.split("\\s+", -1).toSeq
      for ((n, k) <- Seq(1, 2, 3).zipWithIndex) {
        val grams = if (toks.length < n) Seq.empty else toks.sliding(n).map(_.mkString(" ")).toSeq
        assert(out(2 * k) == grams.length.toLong, s"count n=$n for '$text': $out")
        assert(out(2 * k + 1) == grams.distinct.length.toLong, s"distinct n=$n for '$text': $out")
      }
    }
  }

  test("NormalizeText: idempotent, NFC-closed, and insensitive to case/whitespace/composition noise") {
    val wordGen: Gen[String] = Gen.oneOf(
      "The", "FOX", "über", "Café", "café", // decomposed é
      "日本", "a", "", "  ", "\t", "mixedCASE")
    val textGen: Gen[String] = Gen.listOf(wordGen).map(_.mkString(" "))
    def norm(t: String): String =
      Seq((1L, t)).toDF("id", "t")
        .select(graft.plans.TextVectorExpressions.normalizeText(org.apache.spark.sql.functions.col("t")))
        .as[String].head()
    for (text <- samples(textGen, 30)) {
      val once = norm(text)
      assert(norm(once) == once, s"not idempotent on '$text': '$once' -> '${norm(once)}'")
      assert(java.text.Normalizer.isNormalized(once, java.text.Normalizer.Form.NFC),
        s"output not NFC for '$text'")
      assert(once == once.toLowerCase(java.util.Locale.ROOT), s"case survives for '$text'")
      assert(!once.contains("  ") && once == once.trim, s"whitespace survives for '$text'")
      // noise injection: extra spaces + uppercase must not change the key
      val noisy = "  " + text.toUpperCase(java.util.Locale.ROOT).replace(" ", "   ") + " "
      // (upper-then-normalize equals normalize for case-roundtrip-safe
      // corpora; the generator avoids one-way case chars like ß/İ)
      assert(norm(noisy) == norm(text.toUpperCase(java.util.Locale.ROOT)),
        s"whitespace noise changed the key for '$text'")
    }
  }

  test("removeRepeatedSpans: kept tokens are an ordered subsequence; every hot-span position is excised") {
    import org.apache.spark.sql.functions._
    // small vocab forces cross-doc span collisions
    val docGen: Gen[List[String]] = Gen.listOfN(6,
      Gen.listOfN(9, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))
    for (texts <- samples(docGen, 6)) {
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val out = graft.operators.Dedup.removeRepeatedSpans(docs, "doc_id", "text", spanTokens = 3, minDocs = 2)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      // ground truth: hot 3-grams from the original corpus
      val grams = texts.zipWithIndex.flatMap { case (t, i) =>
        t.split(" ").sliding(3).filter(_.size == 3).map(g => (g.mkString(" "), i))
      }
      val hot = grams.groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2).keySet
      for ((t, i) <- texts.zipWithIndex) {
        val toks = t.split(" ")
        val covered = toks.indices.filter { p =>
          (math.max(0, p - 2) to math.min(p, toks.length - 3))
            .exists(s => hot.contains(toks.slice(s, s + 3).mkString(" ")))
        }.toSet
        val expect = toks.indices.filterNot(covered).map(toks)
        out.get(i.toLong) match {
          case None      => assert(expect.isEmpty, s"doc $i should keep ${expect.mkString(" ")}")
          case Some(txt) => assert(txt == expect.mkString(" "),
            s"doc $i: got '$txt', reference says '${expect.mkString(" ")}'")
        }
      }
    }
  }

  test("assignSplits: every row gets exactly one declared label for random fraction vectors") {
    import org.apache.spark.sql.functions._
    val fracGen: Gen[List[Double]] =
      Gen.choose(2, 4).flatMap(n => Gen.listOfN(n, Gen.choose(1, 10)))
        .map { ws => val s = ws.sum.toDouble; ws.map(_ / s) }
    val df = spark.range(500).toDF("doc_id")
    for (fracs <- samples(fracGen, 8)) {
      val names  = fracs.indices.map(i => s"s$i")
      val splits = names.zip(fracs)
      val counts = graft.operators.Curation.assignSplits(df, "doc_id", splits, salt = fracs.mkString)
        .groupBy("split").count().as[(String, Long)].collect().toMap
      assert(counts.keySet.subsetOf(names.toSet), s"unknown label in $counts")
      assert(counts.values.sum == 500L, s"labels must partition the corpus: $counts")
    }
  }

  test("TokenBucket: admissions over any horizon never exceed burst + rate*time") {
    for (gaps <- samples(Gen.listOfN(30, Gen.choose(0L, 500_000_000L)), 20)) {
      var clock  = 0L
      val bucket = new TokenBucket(ratePerSecond = 4, burst = 3, nowNanos = () => clock)
      var admitted = 0
      var elapsed  = 0L
      gaps.foreach { gap =>
        clock += gap
        elapsed += gap
        if (bucket.tryAcquire()) admitted += 1
      }
      val bound = 3 + elapsed / 1e9 * 4
      assert(admitted <= bound + 1e-9, s"admitted $admitted over bound $bound")
    }
  }

  private val corpusGen: Gen[List[String]] =
    Gen.listOf(Gen.nonEmptyListOf(
      Gen.oneOf("alpha", "beta", "gamma", "delta", "eps")).map(_.take(12).mkString(" ")))

  test("duplicationWeights: weight mass per content group is exactly 1 on random corpora") {
    import graft.operators.Dedup
    import org.apache.spark.sql.functions._
    for (texts <- samples(corpusGen, 12) if texts.nonEmpty) {
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val mass = Dedup.duplicationWeights(docs, "doc_id", "text")
        .groupBy("content_hash").agg(sum("sample_weight").as("m"))
        .select("m").as[Double].collect()
      assert(mass.forall(m => math.abs(m - 1.0) < 1e-9), s"mass drift: ${mass.toSeq}")
      assert(mass.length == texts.distinct.size)
    }
  }

  test("spanDupFraction stays in [0,1] and agrees with removeRepeatedSpans' kept counts") {
    import graft.operators.Dedup
    import org.apache.spark.sql.functions._
    for (texts <- samples(corpusGen, 8) if texts.size >= 2) {
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val frac = Dedup.spanDupFraction(docs, "doc_id", "text", spanTokens = 3, minDocs = 2)
      val rows = frac.select("doc_id", "n_tokens", "n_dup_tokens", "dup_fraction")
        .as[(Long, Long, Long, Double)].collect()
      assert(rows.forall { case (_, n, d, f) =>
        d >= 0 && d <= n && math.abs(f - d.toDouble / n) < 1e-12 })
      // consistency: tokens kept by excision == n_tokens - n_dup_tokens (per doc)
      val kept = Dedup.removeRepeatedSpans(docs, "doc_id", "text", spanTokens = 3, minDocs = 2)
        .select("doc_id", "n_tokens_kept").as[(Long, Long)].collect().toMap
      assert(rows.forall { case (id, n, d, _) => kept.getOrElse(id, 0L) == n - d },
        s"excision/measurement disagree: $rows vs $kept")
    }
  }

  test("packHistogram conserves tokens and docs for random corpora and budgets") {
    import graft.operators.Curation
    import org.apache.spark.sql.functions._
    for ((texts, budget) <- samples(corpusGen, 8).zip(Seq(5L, 9L, 17L, 33L, 7L, 12L, 20L, 50L))
         if texts.nonEmpty) {
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val out = Curation.packHistogram(docs, "doc_id", "text", budget).cache()
      assert(out.count() == texts.size, "every doc packed exactly once")
      val totalIn = docs.select(size(split(col("text"), " ")).cast("long"))
        .as[Long].collect().sum
      val totalOut = out.agg(sum("n_tokens")).as[Long].head()
      assert(totalOut == totalIn, s"token mass changed: $totalIn -> $totalOut")
      val overBudget = out.filter(!col("oversize"))
        .groupBy("pack_id").agg(sum("n_tokens").as("t"))
        .filter(col("t") > budget).count()
      assert(overBudget == 0, "an in-budget pack exceeded the budget")
    }
  }
}
