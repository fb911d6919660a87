package graft

import org.apache.spark.sql.functions._
import graft.operators.{DriverEval, IndexManifests, InvertedIndex}

/** Pins the driver-side serving evaluators to the ENGINE expressions
  * they replace (the contract that makes skipping the per-query probe
  * jobs safe), and the per-version stats/term-df caches to the sidecar
  * files they shadow — including maintenance (fresh rel dirs) and
  * same-path rebuild (invalidate) transitions.
  */
class DriverEvalSpec extends SparkSpec {
  import spark.implicits._

  // adversarial token/text corpus: ascii, unicode (incl. supplementary
  // planes — UTF-8 binary order differs from Java compareTo there),
  // whitespace variants the ASCII-space trim must NOT strip, empties
  private val texts = Seq(
    "", " ", "   ", "a", " a ", "a b", "a  b", "  a  b  c  ",
    "\ta b", "a b\t", "\na b\n", "a b", "a　b",
    "héllo wörld", "ñ é ü", "日本語 トークン 分割",
    "emoji 😀 🎉 mixed", "𐍈 𝕊 supplementary",
    "tab\tinside", "newline\ninside", "crlf\r\nx",
    "verylongtoken" * 20, ("tok " * 200).trim,
    "punct, mixed. tokens!", "UPPER lower MiXeD"
  )

  test("DriverEval.tokenize equals split(trim(text), \\s+) on the adversarial corpus") {
    val engine = texts.toDF("t")
      .select(col("t"), graft.functions.TextFunctions.tokens(col("t")).as("toks"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    texts.foreach { t =>
      assert(DriverEval.tokenize(t) == engine(t),
        s"tokenize diverged on ${t.take(40).map(c => f"\\u${c.toInt}%04x").mkString}")
    }
  }

  test("DriverEval.bucketOf equals pmod(xxhash64(tok), buckets) for every bucket width") {
    val toks = texts.flatMap(DriverEval.tokenize).distinct.filter(_.nonEmpty) ++
      Seq("a", "zzz", "0", "-", "𐍈")
    for (buckets <- Seq(1, 2, 7, 16, 64, 1024)) {
      val engine = toks.toDF("tok")
        .select(col("tok"),
          pmod(xxhash64(col("tok")), lit(buckets.toLong)).cast("int").as("b"))
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      toks.foreach { t =>
        assert(DriverEval.bucketOf(t, buckets) == engine(t),
          s"bucketOf diverged on '$t' at $buckets buckets")
      }
    }
  }

  private def docsDf = Seq(
    (1L, "alpha beta gamma", "web"), (2L, "beta gamma delta", "web"),
    (3L, "gamma delta epsilon", "book"), (4L, "delta epsilon zeta", "book"),
    (5L, "epsilon zeta alpha", "web")
  ).toDF("doc_id", "text", "source")

  test("cachedStats matches the stats sidecar across build, delta, and same-path rebuild") {
    val dir = java.nio.file.Files.createTempDirectory("drvstats").toString
    InvertedIndex.build(docsDf, "doc_id", "text", dir, buckets = 4)
    val m0 = InvertedIndex.currentManifest(spark, dir)
    def direct(statsRel: String): (Long, Long) = {
      val r = spark.read.parquet(s"$dir/$statsRel")
        .agg(sum("n"), sum("sumdl")).head()
      (r.getLong(0), r.getLong(1))
    }
    assert(IndexManifests.cachedStats(spark, dir, m0.statsDir) == direct(m0.statsDir))
    // cache hit returns the same values (no file dependence): delete
    // nothing, just re-ask
    assert(IndexManifests.cachedStats(spark, dir, m0.statsDir) == direct(m0.statsDir))

    val extra = Seq((6L, "eta theta iota kappa")).toDF("doc_id", "text")
    InvertedIndex.addDelta(extra, "doc_id", "text", dir)
    val m1 = InvertedIndex.currentManifest(spark, dir)
    assert(m1.statsDir != m0.statsDir, "delta must write a FRESH stats dir")
    assert(IndexManifests.cachedStats(spark, dir, m1.statsDir) == direct(m1.statsDir))
    val (n1, _) = IndexManifests.cachedStats(spark, dir, m1.statsDir)
    assert(n1 == 6L)

    // same-path rebuild: build() invalidates, so the fresh tree's
    // scalars are served even though the old key may linger unpaged
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    InvertedIndex.build(docsDf.limit(3), "doc_id", "text", dir, buckets = 4)
    val m2 = InvertedIndex.currentManifest(spark, dir)
    val (n2, _) = IndexManifests.cachedStats(spark, dir, m2.statsDir)
    assert(n2 == 3L, "rebuild at the same path must not serve stale stats")
  }

  test("cachedTermDfs matches the vocab sidecar, omits absent terms, tracks maintenance") {
    val dir = java.nio.file.Files.createTempDirectory("drvdfs").toString
    InvertedIndex.build(docsDf, "doc_id", "text", dir, buckets = 4)
    val m0 = InvertedIndex.currentManifest(spark, dir)
    val asked = Seq("alpha", "beta", "nosuchterm", "gamma")
    val got = IndexManifests.cachedTermDfs(spark, dir, m0.vocabDir, asked)
    val want = spark.read.parquet(s"$dir/${m0.vocabDir}")
      .filter(col("tok").isin(asked: _*))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
    assert(!got.contains("nosuchterm"))
    // absent is CACHED (second ask runs no scan — can't observe jobs
    // here, but the value contract must hold) and present hits repeat
    assert(IndexManifests.cachedTermDfs(spark, dir, m0.vocabDir, asked) == want)

    // a delta that changes dfs commits a NEW vocab rel — the new key
    // must serve the updated dfs, including a term that was previously
    // cached ABSENT in the old rel
    val extra = Seq((6L, "alpha nosuchterm")).toDF("doc_id", "text")
    InvertedIndex.addDelta(extra, "doc_id", "text", dir)
    val m1 = InvertedIndex.currentManifest(spark, dir)
    assert(m1.vocabDir != m0.vocabDir)
    val got1 = IndexManifests.cachedTermDfs(spark, dir, m1.vocabDir, asked)
    assert(got1("alpha") == want("alpha") + 1)
    assert(got1("nosuchterm") == 1L,
      "a term newly added by maintenance must be visible under the new vocab rel")
    // and the OLD version still answers with its own dfs (immutability)
    assert(IndexManifests.cachedTermDfs(spark, dir, m0.vocabDir, asked) == want)
  }

  test("text serves are job-lean: bm25TopKText answers identically with and without the df cap") {
    // value regression for the knownTerms fast path: the driver-side
    // cap must keep/drop exactly the terms the pushed-vocab-scan shape
    // kept/dropped (incl. absent-from-vocab probes)
    val dir = java.nio.file.Files.createTempDirectory("drvtext").toString
    InvertedIndex.build(docsDf, "doc_id", "text", dir, buckets = 4)
    val q = Seq("alpha epsilon nosuchterm", "gamma", "nosuchterm")
    val plain = InvertedIndex.bm25TopKText(spark, dir, q, k = 3)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    assert(plain.nonEmpty)
    // with a 100% cap every present term survives: identical answers
    val capped = InvertedIndex.bm25TopKText(spark, dir, q, k = 3, maxDfPercent = Some(100))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    assert(capped == plain, "a 100% df cap must not change any answer")
    // an aggressive cap drops the high-df terms deterministically —
    // compare against the spec-computed expectation
    val (n, _) = IndexManifests.cachedStats(spark, dir,
      InvertedIndex.currentManifest(spark, dir).statsDir)
    val vocab = spark.read.parquet(
        s"$dir/${InvertedIndex.currentManifest(spark, dir).vocabDir}")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val pct = 40
    val keptTerms = "alpha epsilon nosuchterm".split(" ").filter(t =>
      vocab.get(t).exists(df => df * 100 <= n * pct)).toSet
    val cappedHard = InvertedIndex.bm25TopKText(spark, dir,
        Seq("alpha epsilon nosuchterm"), k = 5, maxDfPercent = Some(pct))
      .collect()
    if (keptTerms.isEmpty) assert(cappedHard.isEmpty)
    else assert(cappedHard.nonEmpty)
  }
}
