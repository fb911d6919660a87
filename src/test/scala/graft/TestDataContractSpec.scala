package graft

import org.apache.spark.sql.functions.{col, size}
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

  test("documents carries the columns the training-data registry depends on") {
    for ((sf, dir) <- sfDirs) {
      val cols = Tables(spark, dir).documents.columns.toSet
      for (c <- Seq("doc_id", "text", "source"))
        assert(cols.contains(c), s"$sf documents missing column $c (has $cols)")
    }
  }

  test("embeddings are 64-dim float arrays (the binarize/PQ/IVF contract)") {
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    for ((sf, dir) <- sfDirs) {
      val emb = Tables(spark, dir).embeddings
      val cols = emb.columns.toSet
      for (c <- Seq("vec_id", "embedding"))
        assert(cols.contains(c), s"$sf embeddings missing column $c (has $cols)")
      assert(emb.schema("embedding").dataType match {
        case ArrayType(FloatType, _) => true
        case _                       => false
      }, s"$sf embedding must be array<float>, got ${emb.schema("embedding").dataType}")
      // emb_binarize codes the first 64 dims; ann/PQ cells assume a
      // fixed dim — drift here must fail by name, not as recall decay
      val dims = emb.select(size(col("embedding")).as("d")).distinct()
        .collect().map(_.getInt(0)).toSeq
      assert(dims == Seq(64), s"$sf embedding dims must be uniformly 64, got $dims")
    }
  }
}
