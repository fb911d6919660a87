package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.InvertedIndex

/** Vocabulary-growth axis: every other scale rung replicates the
  * testdata corpus (ScaleGen), which grows POSTINGS but pins the
  * vocabulary at the source slice's ~31 distinct tokens — so every
  * "vocabulary-sized" claim (suggest flatness at 100×, df-cap vocab
  * resolution, MLT term selection) was untested against the Heaps-law
  * vocabulary a real 100 TB corpus has. This tool holds the POSTINGS
  * mass constant (same docs × tokens-per-doc at every rung) and grows
  * only the DISTINCT-token count 100× across rungs, then measures:
  *
  *  - `suggest`: the pushed-prefix vocab read — the one serve that IS
  *    vocabulary-sized by design; its cost must track the vocab, which
  *    is the honest statement behind "flat at 100×" (that axis was
  *    corpus-100×, vocab-1×).
  *  - `serve`: BM25 text serve with FRESH probe terms per pass (cache
  *    misses forced) — the df lookup is a `tok IN (...)` pushed read,
  *    so it must stay probe-sized, NOT grow with the vocabulary.
  *  - `vocab_mb`: the sidecar's physical size, the thing a df-cap or
  *    suggest scan actually pages through.
  *
  * Token generation is deterministic (hash of (doc, position) modulo
  * the rung's vocab size — no RNG), so rungs are reproducible and the
  * postings row count is identical across rungs by construction.
  *
  * Usage: [SPARK_GRAFT_VOCAB_DOCS=20000] runMain graft.tools.VocabScale
  */
object VocabScale {
  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
  }
  private def minOf3(f: => Unit): Double =
    (1 to 3).map(_ => timed(f)._2).min

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_VOCAB_DOCS", "20000").toLong
    val tokensPerDoc = 40

    def corpus(vocab: Long): DataFrame =
      spark.range(nDocs).select(col("id").as("doc_id"),
        concat_ws(" ", expr(
          s"transform(sequence(0, ${tokensPerDoc - 1}), " +
            s"p -> concat('w', pmod(xxhash64(id * $tokensPerDoc + p), ${vocab}L)))"
        )).as("text"))

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    for (vocab <- Seq(1000L, 10000L, 100000L)) {
      val docs = corpus(vocab)
      val dir = java.nio.file.Files.createTempDirectory(s"vocab_scale_$vocab").toString
      val (_, buildS) = timed(InvertedIndex.build(docs, "doc_id", "text", dir,
        withPositions = false))
      val m = InvertedIndex.currentManifest(spark, dir)
      val realVocab = spark.read.parquet(s"$dir/${m.vocabDir}").count()
      val vocabBytes = {
        val p = new org.apache.hadoop.fs.Path(s"$dir/${m.vocabDir}")
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.getContentSummary(p).getLength
      }
      // suggest: vocabulary-sized by design — the axis this tool exists
      // to price honestly (two-char prefixes select ~1/10 of the vocab)
      val suggestS = minOf3(noop(
        InvertedIndex.suggestTopK(spark, dir, Seq("w1", "w2", "w3"), k = 5)))
      // BM25 serve with fresh terms each pass: the df resolution is a
      // pushed tok IN (...) read and must stay probe-sized as the
      // vocabulary grows (min-of-3 over DISTINCT probe term sets so the
      // per-version df cache cannot hide a vocab-sized scan)
      var pass = 0
      val serveS = minOf3 {
        pass += 1
        val t1 = s"w${(7 * pass) % vocab}"; val t2 = s"w${(13 * pass + 1) % vocab}"
        noop(InvertedIndex.bm25TopKText(spark, dir, Seq(s"$t1 $t2"), k = 5))
      }
      println(f"[vocab-scale] vocab=$realVocab postings=${nDocs * tokensPerDoc} " +
        f"build=$buildS%.2f vocab_mb=${vocabBytes / 1e6}%.2f " +
        f"suggest=$suggestS%.3f serve_fresh_terms=$serveS%.3f")
    }
    spark.stop()
  }
}
