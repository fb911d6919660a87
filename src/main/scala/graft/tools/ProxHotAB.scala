package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.InvertedIndex

/** Same-day A/B for the r11→r12 proximity kernel swap: times the
  * per-doc position intersect BOTH ways over IDENTICAL inputs — the
  * r11 HOF (`filter(pa, p -> exists(pb, q -> q > p && q - p <= w))`,
  * O(|pa|·|pb|) interpreted lambdas per doc) vs the linear two-pointer
  * [[graft.plans.ProximityAnchors]] kernel — on the corpus's hottest
  * term pair (stopword frequency: the HOF's worst case). Answers are
  * asserted identical; each side is min-of-3, order alternated by
  * SPARK_GRAFT_HOF_FIRST.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.ProxHotAB
  */
object ProxHotAB {
  private def timed(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  private def minOf3(f: => Unit): Double = (1 to 3).map(_ => timed(f)).min

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val hofFirst = sys.env.get("SPARK_GRAFT_HOF_FIRST").contains("1")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val window = 5

    val top = docs
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy("tok").count().orderBy(desc("count"), col("tok")).limit(2)
      .collect().map(_.getString(0))
    val dir = java.nio.file.Files.createTempDirectory("prox_ab").toString
    InvertedIndex.build(docs, "doc_id", "text", dir)

    // one (doc, pa, pb) frame, persisted so BOTH sides time ONLY the
    // intersect — not the scan/join they share
    val m = InvertedIndex.currentManifest(spark, dir)
    val postings = spark.read.parquet(
      m.postings.map { case (_, p) => s"$dir/$p" }: _*)
    val pairs = postings.filter(col("tok") === top(0)).select(
        col("doc_id"), col("positions").as("pa"))
      .join(postings.filter(col("tok") === top(1)).select(
        col("doc_id"), col("positions").as("pb")), Seq("doc_id"))
      .persist()
    val nDocs = pairs.count()

    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def runKernel(): Unit = noop(pairs.select(col("doc_id"),
      graft.plans.SpanNearCount.proximityAnchors(col("pa"), col("pb"), window).as("n")))
    def runHof(): Unit = noop(pairs.select(col("doc_id"),
      size(filter(col("pa"), p =>
        exists(col("pb"), q => q > p && q - p <= lit(window)))).cast("long").as("n")))

    // answers identical before timing anything
    val diff = pairs.select(col("doc_id"),
        graft.plans.SpanNearCount.proximityAnchors(col("pa"), col("pb"), window).as("k"),
        size(filter(col("pa"), p =>
          exists(col("pb"), q => q > p && q - p <= lit(window)))).cast("long").as("h"))
      .filter(col("k") =!= col("h")).count()
    require(diff == 0, s"kernel and HOF disagree on $diff docs")

    val (hofS, kernelS) =
      if (hofFirst) { val h = minOf3(runHof()); val k = minOf3(runKernel()); (h, k) }
      else { val k = minOf3(runKernel()); val h = minOf3(runHof()); (k, h) match { case (k2, h2) => (h2, k2) } }
    val avgLen = pairs.select(avg(size(col("pa"))), avg(size(col("pb")))).head()
    println(f"[prox-ab] sf=$sfDir pair='${top.mkString(" ")}' docs=$nDocs " +
      f"avg_pa=${avgLen.getDouble(0)}%.0f avg_pb=${avgLen.getDouble(1)}%.0f " +
      f"hof=$hofS%.3f kernel=$kernelS%.3f speedup=${hofS / kernelS}%.1fx " +
      f"order=${if (hofFirst) "hof-first" else "kernel-first"}")

    // synthetic worst case: the corpus's docs are short (tf ≈ 2), so
    // the quadratic never bites there — THIS axis is where it did: long
    // documents where both terms sit at stopword frequency (|pa| =
    // |pb| = L/2 → L²/4 lambda evaluations per doc under the HOF,
    // L/2 pointer steps under the kernel)
    import spark.implicits._
    for (halfLen <- Seq(500, 2000)) {
      val synth = (0 until 256).map { d =>
        (d.toLong,
          (0 until halfLen).map(i => 2 * i).toArray,   // "a" at even positions
          (0 until halfLen).map(i => 2 * i + 1).toArray) // "b" at odd
      }.toDF("doc_id", "pa", "pb").persist()
      synth.count()
      def kSyn(): Unit = noop(synth.select(
        graft.plans.SpanNearCount.proximityAnchors(col("pa"), col("pb"), window).as("n")))
      def hSyn(): Unit = noop(synth.select(
        size(filter(col("pa"), p =>
          exists(col("pb"), q => q > p && q - p <= lit(window)))).cast("long").as("n")))
      val (hS, kS) =
        if (hofFirst) { val h = minOf3(hSyn()); val k = minOf3(kSyn()); (h, k) }
        else { val k = minOf3(kSyn()); val h = minOf3(hSyn()); (h, k) }
      println(f"[prox-ab-synth] docs=256 tf=$halfLen hof=$hS%.3f kernel=$kS%.3f " +
        f"speedup=${hS / kS}%.1fx order=${if (hofFirst) "hof-first" else "kernel-first"}")
      synth.unpersist()
    }
    spark.stop()
  }
}
