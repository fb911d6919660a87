package graft

import graft.operators.{Layout, RangeJoin}
import org.apache.spark.sql.functions._

/** Round-5 scale-shape operators: bucketed range join and Z-order layout. */
class RangeLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed range join matches the naive BETWEEN join") {
    val t   = Tables(spark, sfDir)
    val ivs = t.orders.filter(pmod($"o_orderkey", lit(97)) === 0)
      .select($"o_orderkey", $"o_orderdate".as("w_start"),
        ($"o_orderdate" + expr("INTERVAL 6 DAYS")).as("w_end"))
    val pts = t.lineitem.select("l_orderkey", "l_linenumber", "l_shipdate")

    val bucketed = RangeJoin
      .pointInIntervalTs(pts, "l_shipdate", ivs, "w_start", "w_end", bucketWidthSec = 3 * 24 * 3600)
      .select("o_orderkey", "l_orderkey", "l_linenumber")
    val naive = pts.join(ivs,
        $"l_shipdate" >= $"w_start" && $"l_shipdate" <= $"w_end")
      .select("o_orderkey", "l_orderkey", "l_linenumber")

    val b = bucketed.collect().map(_.toSeq).toSet
    val n = naive.collect().map(_.toSeq).toSet
    assert(n.nonEmpty, "test needs a non-empty join result")
    assert(b == n, s"bucketed result drifted: ${b.size} vs ${n.size} rows")
  }

  test("bucketed range join plans as a hash join, not a nested loop") {
    val t   = Tables(spark, sfDir)
    val ivs = t.orders.select($"o_orderkey", $"o_orderdate".as("w_start"),
      ($"o_orderdate" + expr("INTERVAL 6 DAYS")).as("w_end"))
    val pts = t.lineitem.select("l_shipdate")
    val plan = physicalPlan(
      RangeJoin.pointInIntervalTs(pts, "l_shipdate", ivs, "w_start", "w_end", 604800L))
    val s = plan.toString
    assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"),
      s"range join must not fall back to a nested loop:\n$s")
    assert(s.contains("HashJoin"), s"expected a hash join on the bucket key:\n$s")
  }

  test("zValue matches a reference bit-interleave and is monotone in block order") {
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val samples = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 9L), (1023L, 1L), (123456L, 654321L))
    val df  = samples.toDF("x", "y")
    val got = df.select(Layout.zValue($"x", $"y", 21)).as[Long].collect().toSeq
    assert(got == samples.map { case (x, y) => ref(x, y, 21) })
  }

  test("z-order buckets bound BOTH dimensions; single-key sort does not") {
    val li = Tables(spark, sfDir).lineitem
    val domain = li.agg(
      (max($"l_partkey") - min($"l_partkey")).cast("double"),
      (max($"l_suppkey") - min($"l_suppkey")).cast("double"))
      .as[(Double, Double)].head()

    // mean fraction of each dimension's domain spanned per z-bucket;
    // bucketShift = bits keeps bits/2 grid bits of BOTH dims — the
    // normalization is what makes this hold for asymmetric domains
    // (raw interleave would leave the narrow dim unbounded at 1.0)
    val ext = Layout.bucketExtents(li, "l_partkey", "l_suppkey", bits = 12, bucketShift = 12)
      .agg(avg(($"max_x" - $"min_x") / domain._1), avg(($"max_y" - $"min_y") / domain._2))
      .as[(Double, Double)].head()

    assert(ext._1 < 0.5 && ext._2 < 0.5,
      s"z-buckets must bound both dims (got ${ext._1}, ${ext._2})")

    // same bucket count under a partkey-only sort: suppkey is unbounded
    val keySorted = li
      .groupBy((floor($"l_partkey" / 8)).as("bucket"))
      .agg(min($"l_suppkey").as("mn"), max($"l_suppkey").as("mx"))
      .agg(avg(($"mx" - $"mn") / domain._2)).as[Double].head()
    assert(keySorted > ext._2,
      s"single-key layout should be worse on the second dim ($keySorted vs ${ext._2})")
  }

  test("zValueN matches a reference k-lane interleave and reduces to zValue at k=2") {
    def refN(vals: Seq[Long], bits: Int): Long =
      (for { j <- vals.indices; i <- 0 until bits }
        yield ((vals(j) >> i) & 1L) << (i * vals.size + j)).sum
    val rows = Seq((3L, 5L, 9L), (0L, 0L, 0L), (4095L, 1L, 2048L))
    val df   = rows.toDF("a", "b", "c")
    val got3 = df.select(Layout.zValueN(Seq($"a", $"b", $"c"), 12)).as[Long].collect().toSeq
    assert(got3 == rows.map { case (a, b, c) => refN(Seq(a, b, c), 12) })
    val got2 = df.select(Layout.zValueN(Seq($"a", $"b"), 12)).as[Long].collect().toSeq
    val old2 = df.select(Layout.zValue($"a", $"b", 12)).as[Long].collect().toSeq
    assert(got2 == old2, "k=2 round-robin must equal the 2-lane interleave")
  }

  test("3-column z-buckets bound all three dimensions") {
    val li  = Tables(spark, sfDir).lineitem
    val cols = Seq("l_partkey", "l_suppkey", "l_orderkey")
    val dom = li.agg(
      (max($"l_partkey") - min($"l_partkey")).cast("double"),
      (max($"l_suppkey") - min($"l_suppkey")).cast("double"),
      (max($"l_orderkey") - min($"l_orderkey")).cast("double"))
      .as[(Double, Double, Double)].head()
    val ext = Layout.bucketExtentsN(li, cols, bits = 12, bucketShift = 24)
      .agg(avg(($"max_l_partkey" - $"min_l_partkey") / dom._1),
        avg(($"max_l_suppkey" - $"min_l_suppkey") / dom._2),
        avg(($"max_l_orderkey" - $"min_l_orderkey") / dom._3))
      .as[(Double, Double, Double)].head()
    assert(ext._1 < 0.6 && ext._2 < 0.6 && ext._3 < 0.6,
      s"3-dim buckets must bound every dim (got $ext)")
  }

  test("zorderWrite produces the requested file count with tight row-group extents") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString + "/t"
    Layout.zorderWrite(Tables(spark, sfDir).lineitem, "l_partkey", "l_suppkey",
      bits = 12, numFiles = 8, dir = dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length == 8, s"expected 8 z-range files, got ${files.length}")
    val back = spark.read.parquet(dir)
    assert(back.count() == Tables(spark, sfDir).lineitem.count())
  }
}
