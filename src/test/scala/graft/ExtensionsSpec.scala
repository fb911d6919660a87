package graft

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft functions are callable from SQL via SparkSessionExtensions") {
    Seq((1L, "the quick brown fox"), (2L, "the quick brown fox")).toDF("id", "text")
      .createOrReplaceTempView("ext_docs")
    val rows = spark.sql(
      """SELECT id,
        |       simhash64(transform(split(trim(text), '\\s+'), t -> xxhash64(t))) AS sh,
        |       size(shingle_hashes(text, 2)) AS n_shingles,
        |       size(minhash_signature(shingle_hashes(text, 2), 16)) AS sig_len,
        |       size(minhash_bands(shingle_hashes(text, 2), 8, 2)) AS n_bands
        |FROM ext_docs""".stripMargin
    ).collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("sh") == rows(1).getAs[Long]("sh"), "same text, same simhash")
    assert(rows(0).getAs[Int]("n_shingles") == 3)
    assert(rows(0).getAs[Int]("sig_len") == 16)
    assert(rows(0).getAs[Int]("n_bands") == 8)
  }

  test("winnowing_fingerprints and sorted_jaccard are callable from SQL") {
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog tonight")
    ).toDF("id", "text").createOrReplaceTempView("ext_docs2")
    val row = spark.sql(
      """SELECT size(winnowing_fingerprints(a.text, 8, 4)) AS n_fp,
        |       sorted_jaccard(shingle_hashes(a.text, 3), shingle_hashes(b.text, 3)) AS j
        |FROM ext_docs2 a JOIN ext_docs2 b ON a.id = 1 AND b.id = 2""".stripMargin
    ).head()
    assert(row.getAs[Int]("n_fp") > 0)
    val j = row.getAs[Double]("j")
    assert(j > 0.5 && j < 1.0, s"near-dup jaccard expected in (0.5, 1): $j")
  }

  test("text_profile and ngram_profile are callable from SQL") {
    Seq((1L, "the cat and the hat")).toDF("id", "text").createOrReplaceTempView("ext_docs3")
    val row = spark.sql(
      """SELECT text_profile(text) AS tp, ngram_profile(text, 1, 2) AS np
        |FROM ext_docs3""".stripMargin).head()
    val tp = row.getSeq[Long](0)
    val np = row.getSeq[Long](1)
    assert(tp(0) == 5L && tp(1) == 4L, s"token/distinct counts: $tp") // "the" repeats
    assert(tp(2) == 19L, s"code points: $tp")
    assert(np == Seq(5L, 4L, 4L, 4L), s"gram counts: $np")
  }

  test("serving-index table functions answer from SQL, identical to the Scala API") {
    import graft.operators.{AnnIndex, InvertedIndex}
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (0L, "alpha beta gamma alpha"),
      (1L, "beta beta delta"),
      (2L, "alpha delta epsilon epsilon epsilon"),
      (3L, "gamma gamma beta alpha delta"),
      (4L, "alpha beta gamma")
    ).toDF("doc_id", "text")
    val lex = java.nio.file.Files.createTempDirectory("tvf_lex").toString
    InvertedIndex.build(docs, "doc_id", "text", lex)

    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSeq
    assert(rows(spark.sql(s"SELECT * FROM graft_bm25('$lex', 'alpha delta', 3) ORDER BY rank"))
      == rows(InvertedIndex.bm25TopKText(spark, lex, Seq("alpha delta"), 3).orderBy("rank")),
      "graft_bm25 diverged from bm25TopKText")
    // optional df-cap arg: 'alpha' (df 4/5 = 80%) is dropped at 79,
    // leaving a delta-only query — identical to the capped Scala path
    assert(rows(spark.sql(
        s"SELECT * FROM graft_bm25('$lex', 'alpha delta', 3, 79) ORDER BY rank"))
      == rows(InvertedIndex.bm25TopKText(spark, lex, Seq("alpha delta"), 3,
        maxDfPercent = Some(79)).orderBy("rank")),
      "graft_bm25 with max_df_percent diverged from the capped Scala path")
    assert(rows(spark.sql(s"SELECT * FROM graft_phrase('$lex', 'alpha beta', 5) ORDER BY doc_id"))
      == rows(InvertedIndex.phraseTopK(spark, lex, Seq("alpha beta"), 5).orderBy("doc_id")),
      "graft_phrase diverged from phraseTopK")
    assert(rows(spark.sql(
        s"SELECT * FROM graft_proximity('$lex', 'alpha', 'delta', 3, 5) ORDER BY doc_id"))
      == rows(InvertedIndex.proximityTopK(spark, lex, Seq(("alpha", "delta")), 3, 5)
        .orderBy("doc_id")),
      "graft_proximity diverged from proximityTopK")
    assert(rows(spark.sql(
        s"SELECT * FROM graft_spannear('$lex', 'alpha beta gamma', 2, false, 5) ORDER BY doc_id"))
      == rows(InvertedIndex.spanNearTopK(spark, lex,
        Seq(Seq("alpha", "beta", "gamma")), 2, inOrder = false, 5).orderBy("doc_id")),
      "graft_spannear diverged from spanNearTopK")

    // more-like-this through the SQL path == the Scala raw-text MLT;
    // with m = 1 the rarest exemplar term (epsilon, df 1) is selected,
    // so the single hit must be doc 2 — the idf-ranked selection rule
    // is observable, not just plumbed
    assert(rows(spark.sql(
        s"SELECT * FROM graft_mlt('$lex', 'alpha delta epsilon', 2, 5) ORDER BY rank"))
      == rows(InvertedIndex.moreLikeThisTopKText(spark, lex,
        Seq("alpha delta epsilon"), m = 2, k = 5).orderBy("rank")),
      "graft_mlt diverged from moreLikeThisTopKText")
    val mlt1 = spark.sql(s"SELECT * FROM graft_mlt('$lex', 'alpha epsilon', 1, 5)").collect()
    assert(mlt1.length == 1 && mlt1.head.getLong(2) == 2L,
      s"m = 1 must select the rarest term (epsilon) and hit only doc 2, got ${mlt1.toSeq}")

    // prefix suggestions: SQL == Scala, and completions are df-ranked
    // per prefix
    assert(rows(spark.sql(s"SELECT * FROM graft_suggest('$lex', 'g', 3) ORDER BY rank"))
      == rows(InvertedIndex.suggestTopK(spark, lex, Seq("g"), 3).orderBy("rank")),
      "graft_suggest diverged from suggestTopK")
    val sug = InvertedIndex.suggestTopK(spark, lex, Seq("b", "e"), 2)
      .orderBy("prefix", "rank").collect().map(r => (r.getString(0), r.getString(2))).toSeq
    assert(sug == Seq(("b", "beta"), ("e", "epsilon")),
      s"df-ranked completions per prefix, got $sug")

    // highlight positions: SQL == Scala, and the positions are the
    // exact 0-based token offsets (doc 0 = "alpha beta gamma alpha")
    assert(rows(spark.sql(
        s"SELECT * FROM graft_highlight('$lex', 'alpha beta', array(0L, 2L)) ORDER BY doc_id, tok, pos"))
      == rows(InvertedIndex.termPositions(spark, lex, Seq("alpha", "beta"), Seq(0L, 2L))
        .orderBy("doc_id", "tok", "pos")),
      "graft_highlight diverged from termPositions")
    val hl0 = InvertedIndex.termPositions(spark, lex, Seq("alpha"), Seq(0L))
      .orderBy("pos").collect().map(_.getInt(2)).toSeq
    assert(hl0 == Seq(0, 3), s"doc 0 'alpha' occurrences at 0 and 3, got $hl0")

    // filtered bm25 through the SQL path: predicate string over the
    // meta sidecar == the Scala Column path
    val lexM = java.nio.file.Files.createTempDirectory("tvf_lexm").toString
    InvertedIndex.build(docs.withColumn("src",
        when(col("doc_id") < 2, lit("a")).otherwise(lit("b"))),
      "doc_id", "text", lexM, metaCols = Seq("src"))
    assert(rows(spark.sql(
        s"SELECT * FROM graft_bm25_filtered('$lexM', 'alpha delta', 5, 'src = ''b''') ORDER BY rank"))
      == rows(InvertedIndex.bm25TopKText(spark, lexM, Seq("alpha delta"), 5,
        where = Some(col("src") === "b")).orderBy("rank")),
      "graft_bm25_filtered diverged from the Scala where path")
    assert(rows(spark.sql(
        s"SELECT * FROM graft_phrase_filtered('$lexM', 'alpha beta', 5, 'src = ''b''') ORDER BY doc_id"))
      == rows(InvertedIndex.phraseTopK(spark, lexM, Seq("alpha beta"), 5,
        where = Some(col("src") === "b")).orderBy("doc_id")),
      "graft_phrase_filtered diverged from the Scala where path")
    assert(rows(spark.sql(
        s"SELECT * FROM graft_spannear_filtered('$lexM', 'alpha beta gamma', 2, false, 5, 'src = ''a''') ORDER BY doc_id"))
      == rows(InvertedIndex.spanNearTopK(spark, lexM,
        Seq(Seq("alpha", "beta", "gamma")), 2, inOrder = false, 5,
        where = Some(col("src") === "a")).orderBy("doc_id")),
      "graft_spannear_filtered diverged from the Scala where path")
    assert(rows(spark.sql(
        s"SELECT * FROM graft_proximity_filtered('$lexM', 'alpha', 'delta', 3, 5, 'src = ''b''') ORDER BY doc_id"))
      == rows(InvertedIndex.proximityTopK(spark, lexM, Seq(("alpha", "delta")), 3, 5,
        where = Some(col("src") === "b")).orderBy("doc_id")),
      "graft_proximity_filtered diverged from the Scala where path")

    val emb = Tables(spark, sfDir).embeddings
    val ann = java.nio.file.Files.createTempDirectory("tvf_ann").toString
    AnnIndex.build(emb.filter($"vec_id" >= 5), "vec_id", "embedding", ann, nCells = 8,
      metaCols = Seq("label"))
    val probeVec = emb.filter($"vec_id" === 0).select("embedding")
      .head().getSeq[Float](0)
    // widen float -> double BEFORE printing: Float.toString parsed as a
    // double literal is the double nearest the printed decimal, not the
    // widened float — an ulp off per component shifts cosine ties
    val vecSql = probeVec.map(v => s"CAST(${v.toDouble} AS DOUBLE)")
      .mkString("array(", ", ", ")")
    val viaSql = rows(spark.sql(
      s"SELECT * FROM graft_ann('$ann', $vecSql, 5, 4) ORDER BY rank"))
    val viaApi = rows(AnnIndex.topK(
        emb.filter($"vec_id" === 0), "vec_id", "embedding", ann, k = 5, nProbe = 4)
      .select("neighbor_id", "cosine", "rank").orderBy("rank"))
    assert(viaSql == viaApi, "graft_ann diverged from AnnIndex.topK")
    val viaSqlF = rows(spark.sql(
      s"SELECT * FROM graft_ann_filtered('$ann', $vecSql, 5, 4, 'label IN (0, 1)') ORDER BY rank"))
    val viaApiF = rows(AnnIndex.topK(
        emb.filter($"vec_id" === 0), "vec_id", "embedding", ann, k = 5, nProbe = 4,
        where = Some(col("label").isin(0, 1)))
      .select("neighbor_id", "cosine", "rank").orderBy("rank"))
    assert(viaSqlF == viaApiF, "graft_ann_filtered diverged from the Scala where path")
  }

  test("graft_ann serves a corpus containing vector id 0 (no phantom self-exclusion) and TVF arity errors name the signature") {
    import graft.operators.AnnIndex
    val emb = Tables(spark, sfDir).embeddings
    // corpus INCLUDES vec_id 0 — the TVF's synthetic probe id must not
    // collide with it (a raw query vector is not a corpus document, so
    // nothing may be excluded as "self")
    val ann = java.nio.file.Files.createTempDirectory("tvf_ann0").toString
    AnnIndex.build(emb.filter($"vec_id" < 200), "vec_id", "embedding", ann, nCells = 4)
    val qv = emb.filter($"vec_id" === 0).select("embedding").head().getSeq[Float](0)
    val vecSql = qv.map(v => s"CAST(${v.toDouble} AS DOUBLE)")
      .mkString("array(", ", ", ")")
    val got = spark.sql(s"SELECT * FROM graft_ann('$ann', $vecSql, 3, 4) ORDER BY rank")
      .collect()
    // the query vector IS vector 0, so vector 0 must come back rank 1
    assert(got.nonEmpty && got.head.getLong(0) == 0L,
      s"graft_ann must return indexed vector 0 for its own embedding, got ${got.toSeq}")
    // PQ TVF: ADC serve through SQL == the Scala pqTopK path
    val annPq = java.nio.file.Files.createTempDirectory("tvf_annpq").toString
    AnnIndex.build(emb.filter($"vec_id" < 200), "vec_id", "embedding", annPq, nCells = 4,
      pq = Some(AnnIndex.PqSpec(m = 8, nCodes = 16)))
    val viaPqSql = spark.sql(
      s"SELECT * FROM graft_ann_pq('$annPq', $vecSql, 3, 4, 50) ORDER BY rank")
      .collect().map(_.toSeq).toSeq
    val viaPqApi = AnnIndex.pqTopK(
        Seq((0L, qv.map(_.toDouble))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", annPq, k = 3, nProbe = 4, shortlist = 50,
        excludeSelf = false)
      .select("neighbor_id", "cosine", "rank").orderBy("rank")
      .collect().map(_.toSeq).toSeq
    assert(viaPqSql == viaPqApi, "graft_ann_pq diverged from AnnIndex.pqTopK")
    assert(viaPqSql.nonEmpty && viaPqSql.head.head == 0L,
      "the query vector IS vector 0 — it must come back rank 1 through the PQ path")
    // wrong arity fails with the expected parameter list, not an
    // IndexOutOfBoundsException at argument access
    val e = intercept[Throwable] {
      spark.sql(s"SELECT * FROM graft_proximity('$ann', 'alpha')").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(m => m.contains("graft_proximity expects") && m.contains("window")),
      s"arity error must name the signature, got: ${messages(e)}")
  }

  test("graft_hybrid fuses both serving indexes from SQL, identical to the Scala path") {
    import graft.operators.{AnnIndex, InvertedIndex, TextAnalysis}
    import org.apache.spark.sql.functions._
    // one id space across both indexes (0-4 documents; their "embeddings"
    // are the sf corpus vectors for the same ids), each with a `src`
    // sidecar so ONE predicate filters both branches
    val docs = Seq(
      (0L, "alpha beta gamma alpha"),
      (1L, "beta beta delta"),
      (2L, "alpha delta epsilon epsilon epsilon"),
      (3L, "gamma gamma beta alpha delta"),
      (4L, "alpha beta gamma")
    ).toDF("doc_id", "text")
      .withColumn("src", when(col("doc_id") < 2, lit("a")).otherwise(lit("b")))
    val lex = java.nio.file.Files.createTempDirectory("tvf_hyb_lex").toString
    InvertedIndex.build(docs, "doc_id", "text", lex, metaCols = Seq("src"))
    val emb = Tables(spark, sfDir).embeddings
    val ann = java.nio.file.Files.createTempDirectory("tvf_hyb_ann").toString
    AnnIndex.build(
      emb.filter($"vec_id" < 5).select(col("vec_id"), col("embedding"))
        .withColumn("src", when(col("vec_id") < 2, lit("a")).otherwise(lit("b"))),
      "vec_id", "embedding", ann, nCells = 2, metaCols = Seq("src"))
    val qv = emb.filter($"vec_id" === 0).select("embedding").head()
      .getSeq[Float](0).map(_.toDouble).toArray
    val vecSql = qv.map(v => s"CAST($v AS DOUBLE)").mkString("array(", ", ", ")")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSeq

    val viaSql = rows(spark.sql(
      s"SELECT * FROM graft_hybrid('$lex', '$ann', 'alpha delta', $vecSql, 5, 20, 2) ORDER BY rank"))
    val viaApi = rows(TextAnalysis.hybridTopKText(spark, lex, ann,
      "alpha delta", qv, k = 5, depth = 20, nProbe = 2).orderBy("rank"))
    assert(viaSql == viaApi, "graft_hybrid diverged from hybridTopKText")
    // both branches contribute: nProbe = nCells makes the dense branch
    // exact, and every doc carries a query term — the fused list must
    // sum two nonzero reciprocal ranks for its head (present in both)
    assert(viaApi.nonEmpty && viaApi.size == 5,
      s"hybrid over a 5-doc corpus with full term overlap must fill k = 5, got ${viaApi.size}")

    val viaSqlF = rows(spark.sql(
      s"SELECT * FROM graft_hybrid_filtered('$lex', '$ann', 'alpha delta', $vecSql, 5, 20, 2, 'src = ''b''') ORDER BY rank"))
    val viaApiF = rows(TextAnalysis.hybridTopKText(spark, lex, ann,
      "alpha delta", qv, k = 5, depth = 20, nProbe = 2,
      where = Some(col("src") === "b")).orderBy("rank"))
    assert(viaSqlF == viaApiF, "graft_hybrid_filtered diverged from the Scala where path")
    val allowed = Set(2L, 3L, 4L)
    assert(viaApiF.nonEmpty && viaApiF.forall(r => allowed(r(1).asInstanceOf[Long])),
      s"filtered hybrid must only surface src = 'b' docs, got $viaApiF")
  }

  test("SQL shingle_hashes matches the column-API shingle set size") {
    import graft.functions.TextFunctions
    import graft.plans.TextVectorExpressions
    import org.apache.spark.sql.functions._
    val docs = Tables(spark, sfDir).documents.limit(100)
    val mismatches = docs.select(
      size(TextFunctions.shingleSet(col("text"), 3)).as("sql_size"),
      size(TextVectorExpressions.shingleHashes(col("text"), 3)).as("native_size")
    ).filter(col("sql_size") =!= col("native_size")).count()
    assert(mismatches == 0, "native tokenizer must match split(trim(text),'\\\\s+') semantics")
  }
}
