package graft

/** Whole-stage-codegen audit: the hot paths of codegen-friendly
  * headline queries must actually sit INSIDE WholeStageCodegen spans
  * (the `*(n)` markers in the plan string). A Scala UDF, a non-codegen
  * expression, or an accidental object-row boundary silently breaks the
  * span and the query falls back to interpreted row-at-a-time execution
  * — at 100 TB that is the difference between scanning at memory
  * bandwidth and scanning at iterator overhead. (TypedImperative
  * aggregates — KLL, vector sums, distinct_at_least — plan as
  * ObjectHashAggregate by design and are exempt by node name.)
  */
class CodegenAuditSpec extends SparkSpec {

  // codegen-friendly queries whose aggregates/filters must stay fused;
  // chosen across the families: TPC-H aggregation, filter-heavy scans,
  // joins, native text kernels, calendar derivations
  private val audited = Seq(
    "q1_agg", "q6_filter", "q3_join", "q12_priority_class",
    "q_dow_seasonality", "dedup_exact", "text_tokens", "text_quality",
    "q14_promo_share", "q19_disjunctive")

  test("audited queries keep every HashAggregate and Filter inside a codegen span") {
    // under AQE the un-executed plan has no codegen collapsed yet —
    // audit the non-adaptive physical plan, where CollapseCodegenStages
    // has run (AQE re-applies the same rule per stage at runtime)
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try for (name <- audited) {
      val df = Queries.queries(name)(spark, sfDir)
      val planStr = df.queryExecution.executedPlan.toString
      assert(planStr.contains("*("),
        s"$name has NO whole-stage-codegen span at all")
      val bare = planStr.linesIterator.filter { l =>
        val t = l.dropWhile(c => !c.isLetter && c != '*')
        (t.startsWith("HashAggregate") || t.startsWith("Filter")) && !t.startsWith("*")
      }.toSeq
      assert(bare.isEmpty,
        s"$name has operators OUTSIDE codegen spans:\n${bare.mkString("\n")}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
