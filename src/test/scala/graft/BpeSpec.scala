package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** Distributed BPE vs an in-memory reference implementation. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference BPE on (word, freq) pairs: same tie-break (count desc,
    * then pair lexicographic) and the same greedy left-to-right apply.
    */
  private def refBpe(words: Map[String, Long], k: Int): Seq[(String, String, Long)] = {
    var tbl = words.map { case (w, f) => (w.map(_.toString).toVector, f) }.toVector
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var continue = true
    while (out.length < k && continue) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- tbl; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      if (counts.isEmpty) continue = false
      else {
        val ((a, b), cnt) = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
        out += ((a, b, cnt))
        tbl = tbl.map { case (syms, f) =>
          val acc = scala.collection.mutable.ArrayBuffer.empty[String]
          for (s <- syms)
            if (acc.nonEmpty && acc.last == a && s == b) acc(acc.length - 1) = a + b
            else acc += s
          (acc.toVector, f)
        }
      }
    }
    out.toSeq
  }

  test("trainMerges matches reference BPE on a hand-built corpus") {
    val docs = Seq(
      "low low low low low",
      "lower lower newest newest",
      "newest newest newest newest",
      "wider wider new new new"
    ).toDF("text")

    val expected = refBpe(
      Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "wider" -> 2L, "new" -> 3L), k = 10)
    val got = Bpe.trainMerges(docs, "text", k = 10)
      .orderBy("rank").as[(Int, String, String, String, Long)].collect()
      .map { case (_, a, b, _, cnt) => (a, b, cnt) }.toSeq
    assert(got == expected)
  }

  test("greedy merge never re-merges its own output in one pass") {
    val df = Seq(Seq("a", "a", "a")).toDF("syms")
    val out = df.select(Bpe.mergePair(col("syms"), lit("a"), lit("a"))).as[Seq[String]].head()
    assert(out == Seq("aa", "a"), s"got $out")
  }

  test("applyMerges reproduces the trained segmentation in document order") {
    val docs   = Seq((1L, "the the theme"), (2L, "the them")).toDF("id", "text")
    val merges = Bpe.trainMerges(docs, "text", k = 3)
      .orderBy("rank").as[(Int, String, String, String, Long)].collect()
      .map { case (_, a, b, _, _) => (a, b) }.toSeq
    val toks = Bpe.applyMerges(docs, "id", "text", merges)
      .orderBy("id").select("bpe_tokens").as[Seq[String]].collect()
    // "the" is the dominant word: after 2 merges it is one token
    assert(toks.head.contains("the"))
    // segmentation is a partition of the original characters, in order
    assert(toks.head.mkString == "thethetheme")
    assert(toks(1).mkString == "thethem")
  }

  test("applyMerges word-table fold equals the per-occurrence fold") {
    val docs = Tables(spark, sfDir).documents.limit(30).select($"doc_id", $"text")
    val merges = Seq(("e", "r"), ("t", "h"), ("th", "e"))
    val viaWords = Bpe.applyMerges(docs, "doc_id", "text", merges)
      .orderBy("doc_id").select("bpe_tokens").as[Seq[String]].collect().toSeq
    // reference: fold every occurrence directly (the slow formulation)
    val perOcc = docs.withColumn("bpe_tokens",
        flatten(transform(
          expr("transform(split(trim(text), '\\\\s+'), w -> filter(split(w, ''), s -> length(s) > 0))"),
          syms => merges.foldLeft(syms) { case (acc, (a, b)) => Bpe.mergePair(acc, lit(a), lit(b)) })))
      .orderBy("doc_id").select("bpe_tokens").as[Seq[String]].collect().toSeq
    assert(viaWords == perOcc)
  }

  test("pair counts are invariant to document partitioning") {
    val docs = Tables(spark, sfDir).documents.limit(50)
    val a = Bpe.pairCounts(Bpe.initialSymbols(docs, "text"))
      .orderBy("a", "b").collect().toSeq
    val b = Bpe.pairCounts(Bpe.initialSymbols(docs.repartition(7), "text"))
      .orderBy("a", "b").collect().toSeq
    assert(a == b)
  }
}
