package graft

import org.apache.spark.sql.functions._

/** Dev tool: A/B the ngram-LM scoring shapes — current (model and
  * scored side each re-evaluate the shingle explode) vs per-(doc, gram)
  * pre-aggregation whose exchange both sides reuse (one tokenize pass,
  * one extra instance-sized shuffle).
  */
object ProfileText {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def docs = Tables(spark, sfDir).documents
    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[t] $name%-22s pass$i ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      }
    }
    spark.read.parquet(s"$sfDir/documents.parquet").write.format("noop").mode("overwrite").save()
    val n = 2; val minCount = 2L
    time("ngram current") {
      operators.TextAnalysis.ngramLmScore(docs, "doc_id", "text", n, minCount)
        .orderBy("doc_id")
    }
    time("ngram pre-agg") {
      val grams = docs.select(col("doc_id"),
        explode(graft.functions.TextFunctions.wordShingles(col("text"), n)).as("__g"))
      val perDoc = grams.groupBy(col("doc_id"), col("__g")).agg(count(lit(1)).as("__k"))
      val model = perDoc.groupBy(col("__g")).agg(sum(col("__k")).as("__c"))
        .filter(col("__c") >= minCount)
      perDoc.join(model, Seq("__g"), "left")
        .groupBy(col("doc_id"))
        .agg(
          sum(col("__k")).as("n_ngrams"),
          sum(when(col("__c").isNotNull, col("__k")).otherwise(0L)).as("n_covered"),
          sum(col("__k") * coalesce(col("__c"), lit(0L))).as("sum_model_count"))
        .select(
          col("doc_id"), col("n_ngrams"), col("n_covered"),
          (col("n_covered").cast("double") / col("n_ngrams")).as("coverage"),
          (col("sum_model_count").cast("double") / col("n_ngrams")).as("mean_model_count"))
        .orderBy("doc_id")
    }
    spark.stop()
  }
}
