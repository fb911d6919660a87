package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{InvertedIndex, TextAnalysis}

/** Scale measurement for the persisted inverted index: separates the
  * one-time BUILD cost from the per-query SERVE cost and the per-batch
  * MAINTENANCE cost, each vs the from-scratch `search_bm25` recompute —
  * the operational claim behind `search_bm25_indexed` is exactly this
  * split (the board's registered query times build+serve together,
  * which hides it).
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.InvIndexScale
  * Prints one labeled line per measurement; serve/scratch are min-of-3.
  */
object InvIndexScale {
  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
  }
  private def minOf3(f: => Unit): Double =
    (1 to 3).map(_ => timed(f)._2).min

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val nDocs = docs.count()
    val probes = Seq(0L, 7L, 42L)
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val dir = java.nio.file.Files.createTempDirectory("invidx_scale").toString
    val (_, buildS) = timed(InvertedIndex.build(docs, "doc_id", "text", dir))
    val serveS = minOf3(noop(
      InvertedIndex.bm25TopK(docs, "doc_id", "text", dir, probes, k = 5)))
    val scratchS = minOf3(noop(
      TextAnalysis.bm25TopK(docs, "doc_id", "text", probes, k = 5)))

    // maintenance: fold a ~1% delta into an index built on the other 99%
    val deltaPred = pmod(xxhash64(col("doc_id")), lit(100L)) === 0
    val dir2 = java.nio.file.Files.createTempDirectory("invidx_scale_d").toString
    InvertedIndex.build(docs.filter(!deltaPred), "doc_id", "text", dir2)
    val (_, deltaS) = timed(
      InvertedIndex.addDelta(docs.filter(deltaPred), "doc_id", "text", dir2))

    println(f"[invidx] sf=$sfDir docs=$nDocs build=$buildS%.2f serve=$serveS%.2f " +
      f"scratch=$scratchS%.2f delta1pct=$deltaS%.2f serve_vs_scratch=${scratchS / serveS}%.1fx")
    spark.stop()
  }
}
