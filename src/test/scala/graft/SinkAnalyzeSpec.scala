package graft

import graft.operators.{Analyze, NameMapping, SinkProperties}
import graft.streaming.ChangeCapture
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import java.nio.file.Files
import scala.jdk.CollectionConverters._

class SinkAnalyzeSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned sink prunes directories at planning time") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_part").toString + "/t"
    val df  = Tables(spark, sfDir).events.withColumn("day", to_date(col("ts")))
    SinkProperties.write(df, dir, SinkProperties.TableProperties(partitionedBy = Seq("day")))

    val dayDirs = new java.io.File(dir).listFiles().filter(_.getName.startsWith("day="))
    assert(dayDirs.length > 1, "expected multiple hive-style day partitions")

    val oneDay = dayDirs.head.getName.stripPrefix("day=")
    val q    = spark.read.parquet(dir).filter(col("day") === oneDay)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), s"expected partition filters in scan:\n$plan")
    assert(!plan.contains("PartitionFilters: []"), "partition filter must not be empty")
    assert(q.count() == df.filter(col("day") === oneDay).count())
  }

  test("HLL sketches estimate within error bounds and merge losslessly across shards") {
    import org.apache.spark.sql.functions._
    import graft.operators.Sketches
    val ev = Tables(spark, sfDir).events

    val exact = ev.groupBy($"event_type").agg(countDistinct($"user_id").as("ndv"))
      .as[(String, Long)].collect().toMap
    val approx = Sketches.approxDistinct(ev, Seq("event_type"), "user_id")
      .as[(String, Long)].collect().toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n).toDouble / n < 0.05, s"$k: approx $a vs exact $n drifted > 5%")
    }

    // re-aggregation: per-(type, day) partials unioned up to type must
    // agree with the direct sketch (same registers, merged)
    val partials = Sketches.partialSketches(
      ev.withColumn("day", to_date($"ts")), Seq("event_type"), Seq("day"), "user_id")
    assert(partials.count() > exact.size, "expected multiple shards per group")
    val merged = Sketches.mergeSketches(partials, Seq("event_type"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(merged(k) - n).toDouble / n < 0.05,
        s"$k: merged ${merged(k)} vs exact $n drifted > 5%")
    }
  }

  test("SinkProperties writes real parquet bloom filters and sorted files") {
    val dir = Files.createTempDirectory("graft_sinkprops").toString + "/t"
    val df  = Tables(spark, sfDir).events
    // bloom on the (unique) event_id: parquet adaptively skips blooms for
    // fully dictionary-encoded low-cardinality columns like user_id
    SinkProperties.write(df.repartition(2), dir,
      SinkProperties.TableProperties(sortedBy = Seq("user_id"), bloomFilterColumns = Seq("event_id")))

    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(files.head.getAbsolutePath), spark.sparkContext.hadoopConfiguration))
    try {
      val rowGroup = reader.getFooter.getBlocks.get(0)
      val userCol = rowGroup.getColumns.asScala.find(_.getPath.toDotString == "event_id").get
      assert(userCol.getBloomFilterOffset > 0, "bloom filter must be written for event_id")
      val bloom = reader.getBloomFilterDataReader(rowGroup).readBloomFilter(userCol)
      assert(bloom != null)
    } finally reader.close()

    // sortedBy: user_id non-decreasing within each file
    for (f <- files) {
      val ids = spark.read.parquet(f.getAbsolutePath).select("user_id").as[Long].collect()
      assert(ids.sameElements(ids.sorted), s"${f.getName} not sorted by user_id")
    }
  }

  test("Analyze.columnStats computes stats for all columns in one pass") {
    val stats = Analyze.columnStats(Tables(spark, sfDir).orders,
      Seq("o_orderkey", "o_totalprice"), exact = true)
    assert(stats.count() == 2)
    val byCol = stats.collect().map(r => r.getAs[String]("column") -> r).toMap
    assert(byCol("o_orderkey").getAs[Long]("ndv") == byCol("o_orderkey").getAs[Long]("n_non_null"),
      "orderkey is unique")
    // the approx (scale) path is a single aggregation: exactly one scan
    val approx = Analyze.columnStats(Tables(spark, sfDir).orders,
      Seq("o_orderkey", "o_totalprice"), exact = false)
    val scans = approx.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"expected one scan, got $scans")
  }

  test("Analyze.corrMatrix matches built-in corr and runs in one scan") {
    import org.apache.spark.sql.functions.corr
    val li = Tables(spark, sfDir).lineitem
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    val m = Analyze.corrMatrix(li, cols)
    // count scans BEFORE executing: the post-run AQE plan string prints
    // final + initial plans and would double-count the one FileScan
    val scans = m.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"the moment sums must come from ONE scan, got $scans")
    val got = m.collect().map(r =>
      (r.getAs[String]("col_x"), r.getAs[String]("col_y")) -> r.getAs[Double]("corr")).toMap
    assert(got.size == 3, "3 columns give 3 pairs")
    for (((x, y), v) <- got) {
      val ref = li.agg(corr(org.apache.spark.sql.functions.col(x),
        org.apache.spark.sql.functions.col(y))).as[Double].head()
      assert(math.abs(v - ref) < 1e-9, s"corr($x,$y): decimal-exact $v vs built-in $ref")
      assert(v >= -1.0 && v <= 1.0)
    }
    // perfectly correlated / anti-correlated sanity pins the sign convention
    val tiny = Seq((1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0), (4.0, 8.0, -4.0))
      .toDF("a", "b", "c")
    val t = Analyze.corrMatrix(tiny, Seq("a", "b", "c")).collect()
      .map(r => (r.getAs[String]("col_x"), r.getAs[String]("col_y")) -> r.getAs[Double]("corr")).toMap
    assert(math.abs(t(("a", "b")) - 1.0) < 1e-12 && math.abs(t(("a", "c")) + 1.0) < 1e-12)
  }

  test("NameMapping renames only mapped columns") {
    val df  = Seq((1, "x")).toDF("a", "b")
    val out = NameMapping.applyMapping(df, Map("a" -> "id"))
    assert(out.columns.toSeq == Seq("id", "b"))
  }

  test("TokenBucket admits bursts then enforces the steady rate") {
    var clock = 0L
    val bucket = new graft.streaming.TokenBucket(ratePerSecond = 10, burst = 5, nowNanos = () => clock)
    assert((1 to 5).forall(_ => bucket.tryAcquire()), "burst capacity")
    assert(!bucket.tryAcquire(), "empty after burst")
    clock += 100_000_000L // 0.1s -> 1 token at 10/s
    assert(bucket.tryAcquire() && !bucket.tryAcquire())
    assert(bucket.nanosUntilAvailable(2) == 200_000_000L)
    clock += 10_000_000_000L // long idle: capped at burst
    assert((1 to 5).forall(_ => bucket.tryAcquire()) && !bucket.tryAcquire())
  }

  test("ChangeCapture jitter is deterministic, bounded, and non-constant") {
    val cc1 = new ChangeCapture(intervalMs = 5000, jitterVariance = 0.1, jitterSeed = 7)
    val cc2 = new ChangeCapture(intervalMs = 5000, jitterVariance = 0.1, jitterSeed = 7)
    val s1  = cc1.schedule(100)
    assert(s1 == cc2.schedule(100), "same seed, same schedule")
    assert(s1.forall(d => d >= 4500 && d <= 5500), "jitter within ±variance")
    assert(s1.distinct.size > 1, "jitter must vary")
  }
}
