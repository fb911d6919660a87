package graft

import org.apache.spark.sql.functions._

/** Dev tool (like [[Explain]]): phase-level wall/job breakdown of the
  * index-lifecycle bench entries, to aim optimization at the phase that
  * actually pays. Not part of the driver contract.
  */
object ProfileLifecycle {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val verbose = sys.env.contains("SPARK_GRAFT_PROFILE_VERBOSE")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (verbose) {
          val cs = Option(js.properties).map(_.getProperty("callSite.short", "?")).getOrElse("?")
          println(s"[job] ${js.jobId} stages=${js.stageInfos.size} $cs :: " +
            js.stageInfos.map(_.name.take(60)).mkString(" | ").take(200))
        }
        ()
      }
    })
    def phase[A](name: String)(f: => A): A = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  jobs=${jobs.get() - j0}")
      r
    }
    def spread(df: org.apache.spark.sql.DataFrame) =
      df.repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
        .select("doc_id", "text")
    // warmup
    spark.read.parquet(s"$sfDir/documents.parquet").write.format("noop").mode("overwrite").save()
    for (pass <- 1 to 3) {
      println(s"--- pass $pass ---")
      val work = java.nio.file.Files.createTempDirectory("graft_prof_cdc").toString + "/idx"
      val docs = spread(Tables(spark, sfDir).documents)
      val seed = docs.filter(pmod(col("doc_id"), lit(5)) =!= 4)
      phase("cdc: build(seed)") {
        operators.InvertedIndex.build(seed, "doc_id", "text", work, withPositions = false)
      }
      val updates = seed
        .filter(pmod(col("doc_id"), lit(13)) === 6 && pmod(col("doc_id"), lit(11)) =!= 5)
        .select(col("doc_id"), concat_ws(" ", col("text"), col("text")).as("text"))
      val inserts = docs.filter(pmod(col("doc_id"), lit(5)) === 4)
      val deletes = seed.filter(pmod(col("doc_id"), lit(11)) === 5).select("doc_id")
      val leaving = updates.select("doc_id").unionByName(deletes)
      phase("cdc: applyCdc") {
        operators.InvertedIndex.applyCdc(
          upserts = updates.unionByName(inserts),
          removals = seed.join(leaving, Seq("doc_id"), "left_semi"),
          "doc_id", "text", work)
      }
      phase("cdc: serve bm25TopK") {
        operators.InvertedIndex.bm25TopK(docs, "doc_id", "text", work,
            probeIds = Seq(0L, 7L, 42L), k = 5)
          .orderBy("probe_id", "rank")
          .write.format("noop").mode("overwrite").save()
      }
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
      val work2 = java.nio.file.Files.createTempDirectory("graft_prof_d").toString + "/idx"
      phase("delta: build(half)") {
        operators.InvertedIndex.build(
          docs.filter(pmod(col("doc_id"), lit(2)) === 0), "doc_id", "text", work2,
          withPositions = false)
      }
      phase("delta: addDelta(half)") {
        operators.InvertedIndex.addDelta(
          docs.filter(pmod(col("doc_id"), lit(2)) === 1), "doc_id", "text", work2)
      }
      phase("delta: serve") {
        operators.InvertedIndex.bm25TopK(docs, "doc_id", "text", work2,
            probeIds = Seq(0L, 7L, 42L), k = 5)
          .orderBy("probe_id", "rank")
          .write.format("noop").mode("overwrite").save()
      }
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work2))
    }
    spark.stop()
  }
}
