package graft

import org.apache.spark.sql.functions._

import graft.operators.Linkage

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  test("edit-distance join (two-table segment blocking) matches brute force exactly") {
    val docs = Tables(spark, sfDir).documents
    def side(srcs: Seq[String]) = docs.filter(col("source").isin(srcs: _*))
      .select(col("doc_id"), substring(col("text"), 1, 12).as("title"))
    val l = side(Seq("src0", "src1"))
    val r = side(Seq("src4", "src5"))

    val blocked = Linkage.editDistanceJoin(l, "doc_id", "title", r, "doc_id", "title", maxDist = 2)
      .as[(Long, Long, Int)].collect().toSet
    val brute = l.as("a").join(r.as("b"),
        levenshtein(col("a.title"), col("b.title")) <= 2)
      .select(col("a.doc_id"), col("b.doc_id"),
        levenshtein(col("a.title"), col("b.title")).as("d"))
      .as[(Long, Long, Int)].collect().toSet
    assert(brute.nonEmpty, "corpus should contain cross-source near-title pairs at d=2")
    assert(blocked == brute, "two-table segment blocking lost or invented pairs vs brute force")
  }

  test("edit-distance join hand-checked: asymmetric tables, exact matches, empty string") {
    val l = Seq((1L, "kitten"), (2L, ""), (3L, "abc")).toDF("id", "s")
    val r = Seq((10L, "sitting"), (11L, "kitten"), (12L, "a"), (13L, "abc")).toDF("id", "s")
    val pairs = Linkage.editDistanceJoin(l, "id", "s", r, "id", "s", maxDist = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs == Set(
      (1L, 10L, 3), (1L, 11L, 0),          // kitten→sitting, kitten→kitten
      (2L, 12L, 1), (2L, 13L, 3),          // ""→"a", ""→"abc"
      (3L, 12L, 2), (3L, 13L, 0)           // abc→a, abc→abc
    ), s"hand-checked linkage wrong: $pairs")
  }
}
