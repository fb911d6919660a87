package graft

import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Pins the driver-generated testdata contract so environment drift fails
  * loudly by name instead of silently dropping queries from the
  * correctness board (round 6: a regenerated `events.ts` encoding change
  * knocked 45 queries out of CORRECTNESS with no visible error).
  */
class TestDataContractSpec extends SparkSpec {

  private val sfDirs =
    Seq("sf0.001", "sf0.01", "sf0.1").map(sf => sf -> s"/root/testdata/$sf")
      .filter { case (_, d) => new java.io.File(d).exists() }

  private val tableNames = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  test("every table exists and is non-empty at every available SF") {
    for ((sf, dir) <- sfDirs; name <- tableNames) {
      val path = s"$dir/$name.parquet"
      assert(new java.io.File(path).exists(), s"$sf/$name.parquet missing")
      assert(spark.read.parquet(path).limit(1).count() == 1L,
        s"$sf/$name.parquet is empty")
    }
  }

  test("events.ts arrives in an encoding Tables.events can load as a timestamp") {
    for ((sf, dir) <- sfDirs) {
      val rawTs = spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
      assert(
        rawTs == LongType || rawTs == TimestampType || rawTs == TimestampNTZType,
        s"$sf events.ts has unsupported dtype $rawTs — update Tables.events")
      val loaded = Tables(spark, dir).events
      assert(loaded.schema("ts").dataType == TimestampType,
        s"$sf Tables.events must normalize ts to TimestampType, got " +
          loaded.schema("ts").dataType)
      // the projection must actually execute, not just analyze
      assert(loaded.select("ts").limit(1).count() == 1L)
    }
  }

  test("events carries the columns the registry depends on") {
    val cols = Tables(spark, sfDir).events.columns.toSet
    for (c <- Seq("ts", "user_id", "event_type"))
      assert(cols.contains(c), s"events missing column $c (has $cols)")
  }
}
