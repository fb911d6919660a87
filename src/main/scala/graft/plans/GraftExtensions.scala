package graft.plans

import org.apache.spark.sql.{GraftShim, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.unsafe.types.UTF8String

/** SparkSessionExtensions entry point registering the graft expressions
  * as SQL functions, so `spark.sql("SELECT simhash64(...)")` works and
  * the engine is usable from pure SQL:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  * }}}
  *
  * Functions: `shingle_hashes(text, n)`, `minhash_signature(hashes, k)`,
  * `minhash_bands(hashes, bands, rowsPerBand)`, `simhash64(hashes)`,
  * `winnowing_fingerprints(text, k, w)`, `sorted_jaccard(a, b)`,
  * `sorted_intersect(a, b)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, name: String): Int = e.eval() match {
    case i: Int  => i
    case l: Long => l.toInt
    case other   => throw new IllegalArgumentException(s"$name must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => AnnTopKStrategy)
    ext.injectFunction(
      (
        FunctionIdentifier("simhash64"),
        new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
        (children: Seq[Expression]) => SimHash64(children.head)
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("minhash_signature"),
        new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
        (children: Seq[Expression]) =>
          MinHashSignature(children.head, intArg(children(1), "numPerm"))
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("minhash_bands"),
        new ExpressionInfo(classOf[MinHashBands].getName, "minhash_bands"),
        (children: Seq[Expression]) =>
          MinHashBands(children.head, intArg(children(1), "bands"), intArg(children(2), "rowsPerBand"))
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("shingle_hashes"),
        new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
        (children: Seq[Expression]) =>
          ShingleHashes(children.head, intArg(children(1), "n"))
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("winnowing_fingerprints"),
        new ExpressionInfo(classOf[WinnowingFingerprintHashes].getName, "winnowing_fingerprints"),
        (children: Seq[Expression]) =>
          WinnowingFingerprintHashes(children.head, intArg(children(1), "k"), intArg(children(2), "w"))
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("sorted_jaccard"),
        new ExpressionInfo(classOf[SortedJaccard].getName, "sorted_jaccard"),
        (children: Seq[Expression]) => SortedJaccard(children.head, children(1))
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("sorted_intersect"),
        new ExpressionInfo(classOf[SortedIntersect].getName, "sorted_intersect"),
        (children: Seq[Expression]) => SortedIntersect(children.head, children(1))
      )
    )
    // ngram_profile(text, n1[, n2, ...]) -> [cnt_n1, dist_n1, cnt_n2, ...]
    ext.injectFunction(
      (
        FunctionIdentifier("ngram_profile"),
        new ExpressionInfo(classOf[NGramProfile].getName, "ngram_profile"),
        (children: Seq[Expression]) =>
          NGramProfile(children.head, children.tail.zipWithIndex.map {
            case (e, i) => intArg(e, s"n($i)")
          })
      )
    )
    // text_profile(text) -> the 7-slot token/char-class profile (the
    // stopword-set variant is Scala-only: sets aren't SQL literals)
    ext.injectFunction(
      (
        FunctionIdentifier("text_profile"),
        new ExpressionInfo(classOf[TextProfile].getName, "text_profile"),
        (children: Seq[Expression]) => TextProfile(children.head, Seq.empty)
      )
    )
    // normalize_text(text) -> trim/ws-collapse/lowercase/NFC canonical form
    ext.injectFunction(
      (
        FunctionIdentifier("normalize_text"),
        new ExpressionInfo(classOf[NormalizeText].getName, "normalize_text"),
        (children: Seq[Expression]) => NormalizeText(children.head)
      )
    )
    // KLL quantile sketch family: kll_sketch_agg(value, k) -> bytes,
    // kll_union_agg(bytes, k) -> bytes, kll_quantiles(bytes, probs),
    // kll_n(bytes). Aggregate builders return the AggregateFunction;
    // the analyzer wraps it in an AggregateExpression.
    ext.injectFunction(
      (
        FunctionIdentifier("kll_sketch_agg"),
        new ExpressionInfo(classOf[KllSketchAgg].getName, "kll_sketch_agg"),
        (children: Seq[Expression]) =>
          KllSketchAgg(children.head, intArg(children(1), "k"))
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("kll_union_agg"),
        new ExpressionInfo(classOf[KllUnionAgg].getName, "kll_union_agg"),
        (children: Seq[Expression]) =>
          KllUnionAgg(children.head, intArg(children(1), "k"))
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("kll_quantiles"),
        new ExpressionInfo(classOf[KllQuantiles].getName, "kll_quantiles"),
        (children: Seq[Expression]) => KllQuantiles(children.head, children(1))
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("kll_n"),
        new ExpressionInfo(classOf[KllN].getName, "kll_n"),
        (children: Seq[Expression]) => KllN(children.head)
      )
    )

    // ---- serving-index table functions --------------------------------
    // SQL surface for the persisted indexes: round 11 shipped the
    // MAINTENANCE half in SQL (CALL graft.system.index_compact/vacuum)
    // but left every serving path Scala-only — a SQL-first user could
    // maintain an index they could not query. These TVFs close that:
    //   SELECT * FROM graft_bm25('<dir>', 'query text', 5)
    //   SELECT * FROM graft_phrase('<dir>', 'exact phrase', 5)
    //   SELECT * FROM graft_proximity('<dir>', 'first', 'second', 3, 5)
    //   SELECT * FROM graft_spannear('<dir>', 'a b c', 2, true, 5)
    //   SELECT * FROM graft_ann('<dir>', array(...), 5, 8)
    // Arguments must be literals (evaluated at resolution — the plan the
    // TVF returns is the same manifest-pruned serve plan the Scala API
    // builds, so bucket/cell pruning and broadcasts are identical).
    def strArg(e: Expression, name: String): String = e.eval() match {
      case s: UTF8String => s.toString
      case other => throw new IllegalArgumentException(
        s"$name must be a string literal, got $other")
    }
    def boolArg(e: Expression, name: String): Boolean = e.eval() match {
      case b: java.lang.Boolean => b.booleanValue()
      case other => throw new IllegalArgumentException(
        s"$name must be a boolean literal, got $other")
    }
    def vecArg(e: Expression, name: String): Array[Double] = {
      import org.apache.spark.sql.types._
      val ad = e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      e.dataType match {
        case ArrayType(DoubleType, _)  => ad.toDoubleArray()
        case ArrayType(FloatType, _)   => ad.toFloatArray().map(_.toDouble)
        case ArrayType(IntegerType, _) => ad.toIntArray().map(_.toDouble)
        case ArrayType(LongType, _)    => ad.toLongArray().map(_.toDouble)
        case other => throw new IllegalArgumentException(
          s"$name must be a numeric array literal, got $other")
      }
    }
    // each TVF declares its signature and arity range; a call with the
    // wrong argument count fails at resolution with the expected
    // parameter list, never an IndexOutOfBoundsException
    def tvf(name: String, signature: String, minArgs: Int, maxArgs: Int)(
        builder: Seq[Expression] => org.apache.spark.sql.DataFrame): Unit =
      ext.injectTableFunction(
        (
          FunctionIdentifier(name),
          new ExpressionInfo("graft.operators.InvertedIndex", name),
          (children: Seq[Expression]) => {
            if (children.size < minArgs || children.size > maxArgs)
              throw new IllegalArgumentException(
                s"$name expects $signature (${
                  if (minArgs == maxArgs) s"$minArgs arguments"
                  else s"$minArgs to $maxArgs arguments"}), got ${children.size}")
            GraftShim.logicalPlan(builder(children))
          }
        )
      )
    tvf("graft_bm25", "(dir, query, k[, max_df_percent])", 3, 4) { args =>
      // optional 4th arg: max_df_percent — the stopword valve (terms
      // with df·100 > n·pct are dropped before bucket pruning)
      graft.operators.InvertedIndex.bm25TopKText(SparkSession.active,
        strArg(args(0), "dir"), Seq(strArg(args(1), "query")), intArg(args(2), "k"),
        maxDfPercent = args.lift(3).map(e => intArg(e, "max_df_percent")))
    }
    // impact-ordered APPROXIMATE serving (champion lists; opt-in —
    // refuses against an index without a buildChampions sidecar)
    tvf("graft_bm25_approx", "(dir, query, k)", 3, 3) { args =>
      graft.operators.InvertedIndex.bm25TopKTextApprox(SparkSession.active,
        strArg(args(0), "dir"), Seq(strArg(args(1), "query")), intArg(args(2), "k"))
    }
    // document-partitioned federation serve (ShardedIndex roots built
    // by buildSharded; global-statistics scoring, unsharded-identical)
    tvf("graft_bm25_sharded", "(dir, query, k)", 3, 3) { args =>
      graft.operators.ShardedIndex.bm25TopKTextSharded(SparkSession.active,
        strArg(args(0), "dir"), Seq(strArg(args(1), "query")), intArg(args(2), "k"))
    }
    // approximate serving over the federation (global champion
    // selection via buildChampionsSharded — flat-approx-identical)
    tvf("graft_bm25_approx_sharded", "(dir, query, k)", 3, 3) { args =>
      graft.operators.ShardedIndex.bm25TopKTextApproxSharded(SparkSession.active,
        strArg(args(0), "dir"), Seq(strArg(args(1), "query")), intArg(args(2), "k"))
    }
    tvf("graft_phrase", "(dir, phrase, k)", 3, 3) { args =>
      graft.operators.InvertedIndex.phraseTopK(SparkSession.active,
        strArg(args(0), "dir"), Seq(strArg(args(1), "phrase")), intArg(args(2), "k"))
    }
    tvf("graft_proximity", "(dir, first, second, window, k)", 5, 5) { args =>
      graft.operators.InvertedIndex.proximityTopK(SparkSession.active,
        strArg(args(0), "dir"),
        Seq((strArg(args(1), "first"), strArg(args(2), "second"))),
        intArg(args(3), "window"), intArg(args(4), "k"))
    }
    tvf("graft_spannear", "(dir, terms, slop, in_order, k)", 5, 5) { args =>
      graft.operators.InvertedIndex.spanNearTopK(SparkSession.active,
        strArg(args(0), "dir"),
        Seq(strArg(args(1), "terms").trim.split("\\s+").toSeq),
        intArg(args(2), "slop"), boolArg(args(3), "in_order"), intArg(args(4), "k"))
    }
    // ANN TVFs: a raw query vector is NOT a corpus vector, so
    // self-exclusion is off — the synthetic probe id must never be able
    // to knock a real corpus id (e.g. vector 0) out of the results
    tvf("graft_ann", "(dir, vector, k, n_probe)", 4, 4) { args =>
      val spark = SparkSession.active
      import spark.implicits._
      val probe = Seq((0L, vecArg(args(1), "vector").toSeq))
        .toDF("probe_id", "embedding")
      graft.operators.AnnIndex.topK(probe, "probe_id", "embedding",
          strArg(args(0), "dir"), k = intArg(args(2), "k"),
          nProbe = intArg(args(3), "n_probe"), excludeSelf = false)
        .select("neighbor_id", "cosine", "rank")
    }
    // persisted IVF+PQ ADC serve (codes scanned, raw vectors only for
    // the shortlist re-rank) — same no-self-exclusion contract
    tvf("graft_ann_pq", "(dir, vector, k, n_probe, shortlist)", 5, 5) { args =>
      val spark = SparkSession.active
      import spark.implicits._
      val probe = Seq((0L, vecArg(args(1), "vector").toSeq))
        .toDF("probe_id", "embedding")
      graft.operators.AnnIndex.pqTopK(probe, "probe_id", "embedding",
          strArg(args(0), "dir"), k = intArg(args(2), "k"),
          nProbe = intArg(args(3), "n_probe"), shortlist = intArg(args(4), "shortlist"),
          excludeSelf = false)
        .select("neighbor_id", "cosine", "rank")
    }
    // filtered variants: the predicate arrives as a SQL expression
    // STRING over the index's meta-sidecar columns (a Column can't ride
    // a SQL literal) — parsed with expr(), evaluated against the
    // sidecar exactly like the Scala `where` path
    tvf("graft_bm25_filtered", "(dir, query, k, predicate)", 4, 4) { args =>
      graft.operators.InvertedIndex.bm25TopKText(SparkSession.active,
        strArg(args(0), "dir"), Seq(strArg(args(1), "query")), intArg(args(2), "k"),
        where = Some(org.apache.spark.sql.functions.expr(strArg(args(3), "predicate"))))
    }
    tvf("graft_phrase_filtered", "(dir, phrase, k, predicate)", 4, 4) { args =>
      graft.operators.InvertedIndex.phraseTopK(SparkSession.active,
        strArg(args(0), "dir"), Seq(strArg(args(1), "phrase")), intArg(args(2), "k"),
        where = Some(org.apache.spark.sql.functions.expr(strArg(args(3), "predicate"))))
    }
    tvf("graft_proximity_filtered", "(dir, first, second, window, k, predicate)", 6, 6) { args =>
      graft.operators.InvertedIndex.proximityTopK(SparkSession.active,
        strArg(args(0), "dir"),
        Seq((strArg(args(1), "first"), strArg(args(2), "second"))),
        intArg(args(3), "window"), intArg(args(4), "k"),
        where = Some(org.apache.spark.sql.functions.expr(strArg(args(5), "predicate"))))
    }
    tvf("graft_spannear_filtered", "(dir, terms, slop, in_order, k, predicate)", 6, 6) { args =>
      graft.operators.InvertedIndex.spanNearTopK(SparkSession.active,
        strArg(args(0), "dir"),
        Seq(strArg(args(1), "terms").trim.split("\\s+").toSeq),
        intArg(args(2), "slop"), boolArg(args(3), "in_order"), intArg(args(4), "k"),
        where = Some(org.apache.spark.sql.functions.expr(strArg(args(5), "predicate"))))
    }
    def idsArg(e: Expression, name: String): Seq[Long] = {
      import org.apache.spark.sql.types._
      val ad = e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      e.dataType match {
        case ArrayType(LongType, _)    => ad.toLongArray().toSeq
        case ArrayType(IntegerType, _) => ad.toIntArray().map(_.toLong).toSeq
        case other => throw new IllegalArgumentException(
          s"$name must be an integer array literal, got $other")
      }
    }
    // highlight positions in SQL: terms as a whitespace-joined string
    // (like graft_spannear), docs as an integer array literal
    tvf("graft_highlight", "(dir, terms, doc_ids)", 3, 3) { args =>
      graft.operators.InvertedIndex.termPositions(SparkSession.active,
        strArg(args(0), "dir"),
        strArg(args(1), "terms").trim.split("\\s+").toSeq,
        idsArg(args(2), "doc_ids"))
    }
    // prefix autocomplete in SQL: top-k vocab completions by df
    tvf("graft_suggest", "(dir, prefix, k)", 3, 3) { args =>
      graft.operators.InvertedIndex.suggestTopK(SparkSession.active,
        strArg(args(0), "dir"), Seq(strArg(args(1), "prefix")), intArg(args(2), "k"))
    }
    // more-like-this in SQL: the exemplar text's top-m idf terms become
    // the query (rarest-first, deterministic), BM25-served; optional
    // trailing predicate filters through the meta sidecar
    tvf("graft_mlt", "(dir, text, m, k[, predicate])", 4, 5) { args =>
      graft.operators.InvertedIndex.moreLikeThisTopKText(SparkSession.active,
        strArg(args(0), "dir"), Seq(strArg(args(1), "text")),
        m = intArg(args(2), "m"), k = intArg(args(3), "k"),
        where = args.lift(4).map(e =>
          org.apache.spark.sql.functions.expr(strArg(e, "predicate"))))
    }
    // the federated twins — same signatures over a ShardedIndex root
    tvf("graft_phrase_sharded", "(dir, phrase, k)", 3, 3) { args =>
      graft.operators.ShardedIndex.phraseTopKSharded(SparkSession.active,
        strArg(args(0), "dir"), Seq(strArg(args(1), "phrase")), intArg(args(2), "k"))
    }
    tvf("graft_highlight_sharded", "(dir, terms, doc_ids)", 3, 3) { args =>
      graft.operators.ShardedIndex.termPositionsSharded(SparkSession.active,
        strArg(args(0), "dir"),
        strArg(args(1), "terms").trim.split("\\s+").toSeq,
        idsArg(args(2), "doc_ids"))
    }
    tvf("graft_suggest_sharded", "(dir, prefix, k)", 3, 3) { args =>
      graft.operators.ShardedIndex.suggestTopKSharded(SparkSession.active,
        strArg(args(0), "dir"), Seq(strArg(args(1), "prefix")), intArg(args(2), "k"))
    }
    tvf("graft_mlt_sharded", "(dir, text, m, k)", 4, 4) { args =>
      graft.operators.ShardedIndex.moreLikeThisTopKTextSharded(SparkSession.active,
        strArg(args(0), "dir"), Seq(strArg(args(1), "text")),
        m = intArg(args(2), "m"), k = intArg(args(3), "k"))
    }
    tvf("graft_ann_sharded", "(dir, vector, k[, n_probe])", 3, 4) { args =>
      val spark = SparkSession.active
      import spark.implicits._
      val probe = Seq((-1L, vecArg(args(1), "vector").toSeq))
        .toDF("probe_id", "embedding")
      graft.operators.ShardedIndex.annTopKSharded(probe, "probe_id", "embedding",
          strArg(args(0), "dir"), k = intArg(args(2), "k"),
          nProbe = args.lift(3).map(e => intArg(e, "n_probe")).getOrElse(4),
          excludeSelf = false)
        .select("neighbor_id", "cosine", "rank")
    }
    // hybrid retrieval in SQL: both serving indexes, one call — text
    // scores through the inverted index, the vector through the ANN
    // index, RRF-fused by the shared ranker-agnostic fusion. Optional
    // trailing args: depth (per-branch list length, default 20) and
    // n_probe (dense recall knob, default 4)
    tvf("graft_hybrid", "(lex_dir, ann_dir, query, vector, k[, depth, n_probe])", 5, 7) { args =>
      graft.operators.TextAnalysis.hybridTopKText(SparkSession.active,
        strArg(args(0), "lex_dir"), strArg(args(1), "ann_dir"),
        strArg(args(2), "query"), vecArg(args(3), "vector"), intArg(args(4), "k"),
        depth = args.lift(5).map(e => intArg(e, "depth")).getOrElse(20),
        nProbe = args.lift(6).map(e => intArg(e, "n_probe")).getOrElse(4))
    }
    // hybrid over a PAIR of federations (ShardedIndex roots)
    tvf("graft_hybrid_sharded", "(lex_dir, ann_dir, query, vector, k[, depth, n_probe])", 5, 7) { args =>
      graft.operators.ShardedIndex.hybridTopKTextSharded(SparkSession.active,
        strArg(args(0), "lex_dir"), strArg(args(1), "ann_dir"),
        strArg(args(2), "query"), vecArg(args(3), "vector"), intArg(args(4), "k"),
        depth = args.lift(5).map(e => intArg(e, "depth")).getOrElse(20),
        nProbe = args.lift(6).map(e => intArg(e, "n_probe")).getOrElse(4))
    }
    tvf("graft_hybrid_filtered",
        "(lex_dir, ann_dir, query, vector, k, depth, n_probe, predicate)", 8, 8) { args =>
      graft.operators.TextAnalysis.hybridTopKText(SparkSession.active,
        strArg(args(0), "lex_dir"), strArg(args(1), "ann_dir"),
        strArg(args(2), "query"), vecArg(args(3), "vector"), intArg(args(4), "k"),
        depth = intArg(args(5), "depth"), nProbe = intArg(args(6), "n_probe"),
        where = Some(org.apache.spark.sql.functions.expr(strArg(args(7), "predicate"))))
    }
    tvf("graft_ann_filtered", "(dir, vector, k, n_probe, predicate)", 5, 5) { args =>
      val spark = SparkSession.active
      import spark.implicits._
      val probe = Seq((0L, vecArg(args(1), "vector").toSeq))
        .toDF("probe_id", "embedding")
      graft.operators.AnnIndex.topK(probe, "probe_id", "embedding",
          strArg(args(0), "dir"), k = intArg(args(2), "k"),
          nProbe = intArg(args(3), "n_probe"), excludeSelf = false,
          where = Some(org.apache.spark.sql.functions.expr(strArg(args(4), "predicate"))))
        .select("neighbor_id", "cosine", "rank")
    }
  }
}
