package graft

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft functions are callable from SQL via SparkSessionExtensions") {
    Seq((1L, "the quick brown fox"), (2L, "the quick brown fox")).toDF("id", "text")
      .createOrReplaceTempView("ext_docs")
    val rows = spark.sql(
      """SELECT id,
        |       simhash64(transform(split(trim(text), '\\s+'), t -> xxhash64(t))) AS sh,
        |       size(shingle_hashes(text, 2)) AS n_shingles,
        |       size(minhash_signature(shingle_hashes(text, 2), 16)) AS sig_len,
        |       size(minhash_bands(shingle_hashes(text, 2), 8, 2)) AS n_bands
        |FROM ext_docs""".stripMargin
    ).collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("sh") == rows(1).getAs[Long]("sh"), "same text, same simhash")
    assert(rows(0).getAs[Int]("n_shingles") == 3)
    assert(rows(0).getAs[Int]("sig_len") == 16)
    assert(rows(0).getAs[Int]("n_bands") == 8)
  }

  test("winnowing_fingerprints and sorted_jaccard are callable from SQL") {
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog tonight")
    ).toDF("id", "text").createOrReplaceTempView("ext_docs2")
    val row = spark.sql(
      """SELECT size(winnowing_fingerprints(a.text, 8, 4)) AS n_fp,
        |       sorted_jaccard(shingle_hashes(a.text, 3), shingle_hashes(b.text, 3)) AS j
        |FROM ext_docs2 a JOIN ext_docs2 b ON a.id = 1 AND b.id = 2""".stripMargin
    ).head()
    assert(row.getAs[Int]("n_fp") > 0)
    val j = row.getAs[Double]("j")
    assert(j > 0.5 && j < 1.0, s"near-dup jaccard expected in (0.5, 1): $j")
  }

  test("text_profile and ngram_profile are callable from SQL") {
    Seq((1L, "the cat and the hat")).toDF("id", "text").createOrReplaceTempView("ext_docs3")
    val row = spark.sql(
      """SELECT text_profile(text) AS tp, ngram_profile(text, 1, 2) AS np
        |FROM ext_docs3""".stripMargin).head()
    val tp = row.getSeq[Long](0)
    val np = row.getSeq[Long](1)
    assert(tp(0) == 5L && tp(1) == 4L, s"token/distinct counts: $tp") // "the" repeats
    assert(tp(2) == 19L, s"code points: $tp")
    assert(np == Seq(5L, 4L, 4L, 4L), s"gram counts: $np")
  }

  test("SQL shingle_hashes matches the column-API shingle set size") {
    import graft.functions.TextFunctions
    import graft.plans.TextVectorExpressions
    import org.apache.spark.sql.functions._
    val docs = Tables(spark, sfDir).documents.limit(100)
    val mismatches = docs.select(
      size(TextFunctions.shingleSet(col("text"), 3)).as("sql_size"),
      size(TextVectorExpressions.shingleHashes(col("text"), 3)).as("native_size")
    ).filter(col("sql_size") =!= col("native_size")).count()
    assert(mismatches == 0, "native tokenizer must match split(trim(text),'\\\\s+') semantics")
  }
}
