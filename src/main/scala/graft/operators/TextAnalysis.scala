package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data curation: token statistics, quality
  * scoring, heuristic language ID, and winnowing fingerprints. Built-in
  * expressions only — the whole family runs inside whole-stage codegen
  * and scales linearly with input bytes.
  */
object TextAnalysis {

  /** Per-document token statistics. */
  def tokenStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = TextFunctions.tokens(col(textCol))
    df.select(
      col(idCol),
      size(t).as("n_tokens"),
      size(array_distinct(t)).as("n_unique_tokens"),
      (length(col(textCol)).cast("double") / size(t)).as("chars_per_token")
    )
  }

  private def classRatio(text: Column, charClass: String): Column =
    length(regexp_replace(text, s"[^$charClass]", "")).cast("double") / length(text)

  private val Stopwords = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "for", "on", "with", "as", "at", "by")

  /** Quality features + a composite score in [0,1]: high alpha ratio,
    * low digit/punct noise, reasonable stopword share. Token + stopword
    * counts come from the one-pass TokenSetCounts kernel (the HOF
    * `filter(transform(tokens, lower), contains)` evaluates interpreted
    * lambdas per token); ratio values are bit-identical.
    */
  def qualityScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val text   = col(textCol)
    val counts = graft.plans.TextVectorExpressions.tokenSetCounts(text, Seq(Stopwords))
    df.withColumn("__c", counts).select(
      col(idCol),
      length(text).as("n_chars"),
      col("__c").getItem(0).as("n_tokens"),
      classRatio(text, "A-Za-z ").as("alpha_ratio"),
      classRatio(text, "0-9").as("digit_ratio"),
      classRatio(text, ".,;:!?").as("punct_ratio"),
      (col("__c").getItem(1).cast("double") / col("__c").getItem(0)).as("stopword_ratio")
    ).withColumn(
      "quality_score",
      round(
        col("alpha_ratio") * 0.5 +
          (lit(1.0) - least(col("digit_ratio") * 5, lit(1.0))) * 0.2 +
          (lit(1.0) - least(col("punct_ratio") * 5, lit(1.0))) * 0.1 +
          least(col("stopword_ratio") * 5, lit(1.0)) * 0.2,
        6
      )
    )
  }

  /** Heuristic language ID: CJK character share decides zh; otherwise the
    * highest stopword-profile hit count wins (ties break in profile
    * order). A real system would use fastText/CLD3; the n-gram heuristic
    * is the reference-free, dependency-free variant.
    */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val profiles: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "was"),
      "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "los", "es"),
      "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"),
      "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "des", "que", "dans")
    )
    val text  = col(textCol)
    val cjkRatio =
      length(regexp_replace(text, "[^\\x{4e00}-\\x{9fff}]", "")).cast("double") / length(text)

    // all profile hit counts in ONE kernel pass over the tokens
    val counts = graft.plans.TextVectorExpressions.tokenSetCounts(text, profiles.map(_._2))
    val scored = profiles.zipWithIndex.foldLeft(df.withColumn("__c", counts)) {
      case (acc, ((lang, _), i)) => acc.withColumn(s"__score_$lang", col("__c").getItem(i + 1))
    }
    val best = profiles.map { case (lang, _) => (lang, col(s"__score_$lang")) }
      .foldLeft(lit("unknown").as("l") -> lit(-1).as("s")) { case ((bl, bs), (lang, score)) =>
        (when(score > bs, lit(lang)).otherwise(bl), when(score > bs, score).otherwise(bs))
      }
    scored
      .withColumn("predicted_lang", when(cjkRatio > 0.05, lit("zh")).otherwise(best._1))
      .select(col(idCol), col("predicted_lang"))
  }

  /** Winnowing fingerprint (Schleimer et al., SIGMOD 2003): hash char
    * k-grams, slide a window of w hashes, keep each window's minimum.
    * Near-dup docs share most fingerprints even after local edits.
    * Native one-pass kernel (plans/TextVectorExpressions.scala) — the
    * HOF formulation allocates a slice per window.
    */
  def winnowingFingerprints(df: DataFrame, idCol: String, textCol: String, k: Int = 8, w: Int = 4): DataFrame =
    df.withColumn("fingerprints",
        graft.plans.TextVectorExpressions.winnowingFingerprints(col(textCol), k, w))
      .select(col(idCol), col("fingerprints"), size(col("fingerprints")).as("n_fingerprints"))
}
