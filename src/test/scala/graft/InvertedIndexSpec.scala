package graft

import org.apache.spark.sql.functions._
import graft.operators.{InvertedIndex, TextAnalysis}

class InvertedIndexSpec extends SparkSpec {

  private def docs = {
    val s = spark
    import s.implicits._
    Seq(
      (0L, "alpha beta gamma alpha"),
      (1L, "beta beta delta"),
      (2L, "alpha delta epsilon epsilon epsilon"),
      (3L, "gamma gamma beta alpha delta"),
      (4L, "zeta eta theta"),
      (5L, "alpha beta"),
      (6L, "delta epsilon zeta"),
      (7L, "beta gamma delta epsilon")
    ).toDF("doc_id", "text")
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("probe_id", "rank").collect().map(_.toSeq).toSeq

  test("indexed BM25 answers identically to the from-scratch query") {
    val dir = java.nio.file.Files.createTempDirectory("invidx").toString
    InvertedIndex.build(docs, "doc_id", "text", dir)
    val indexed = InvertedIndex.bm25TopK(docs, "doc_id", "text", dir,
      probeIds = Seq(0L, 3L), k = 4)
    val scratch = TextAnalysis.bm25TopK(docs, "doc_id", "text",
      probeIds = Seq(0L, 3L), k = 4)
    assert(rows(indexed) == rows(scratch))
  }

  test("index grown by addDelta answers exactly like a full rebuild") {
    val dir = java.nio.file.Files.createTempDirectory("invidx_delta").toString
    InvertedIndex.build(docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", dir)
    InvertedIndex.addDelta(docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", dir)
    val grown = InvertedIndex.bm25TopK(docs, "doc_id", "text", dir,
      probeIds = Seq(0L, 7L), k = 5)
    val full = java.nio.file.Files.createTempDirectory("invidx_full").toString
    InvertedIndex.build(docs, "doc_id", "text", full)
    val rebuilt = InvertedIndex.bm25TopK(docs, "doc_id", "text", full,
      probeIds = Seq(0L, 7L), k = 5)
    assert(rows(grown) == rows(rebuilt))
    // two metadata versions exist after the delta; the query read v=1
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/vocab/v=1")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/stats/v=1")))
  }

  test("query reads only the probe terms' bucket partitions") {
    val dir = java.nio.file.Files.createTempDirectory("invidx_prune").toString
    InvertedIndex.build(docs, "doc_id", "text", dir)
    // single-term probe: doc 4 is the only doc with zeta/eta/theta, so
    // its terms cover ≤ 3 of the 16 buckets
    val q = InvertedIndex.bm25TopK(docs, "doc_id", "text", dir,
      probeIds = Seq(4L), k = 3)
    // pre-execution plan: AQE hasn't materialized query stages yet, so
    // the file scans are still visible to collect
    val scans = physicalPlan(q).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.metadata.get("Location").exists(_.contains("postings")) => s
    }
    assert(scans.nonEmpty, "postings scan not found in plan")
    val scan = scans.head
    assert(scan.metadata("PartitionFilters").contains("bucket"),
      s"no bucket partition filter pushed: ${scan.metadata("PartitionFilters")}")
    assert(scan.selectedPartitions.partitionCount <= 3,
      s"expected <=3 bucket partitions read, got ${scan.selectedPartitions.partitionCount}")
  }

  test("addDelta never reads historical postings") {
    val dir = java.nio.file.Files.createTempDirectory("invidx_noscan").toString
    InvertedIndex.build(docs.filter(col("doc_id") < 4), "doc_id", "text", dir)
    // make historical postings unreadable as parquet: if addDelta tried
    // to scan them the job would fail
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val postings = new org.apache.hadoop.fs.Path(s"$dir/postings")
    val it = fs.listFiles(postings, true)
    var corrupted = 0
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) {
        val out = fs.create(f.getPath, true)
        out.write("not parquet".getBytes); out.close(); corrupted += 1
      }
    }
    assert(corrupted > 0)
    InvertedIndex.addDelta(docs.filter(col("doc_id") >= 4), "doc_id", "text", dir)
    // vocab/stats DID merge (vocabulary-bounded paths, not postings)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/vocab/v=1")))
  }

  test("a lost maintenance race fails before any postings land") {
    val dir = java.nio.file.Files.createTempDirectory("invidx_occ").toString
    InvertedIndex.build(docs.filter(col("doc_id") < 4), "doc_id", "text", dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def postingFiles(): Int = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(s"$dir/postings"), true)
      var n = 0
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
      n
    }
    // another maintainer already claimed version 1: the vocab write is
    // the OCC gate, so this delta must fail WITHOUT appending postings
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/vocab/v=1"))
    val before = postingFiles()
    intercept[Exception] {
      InvertedIndex.addDelta(docs.filter(col("doc_id") >= 4), "doc_id", "text", dir)
    }
    assert(postingFiles() == before,
      "losing the version race must not leave orphan postings")
  }
}
