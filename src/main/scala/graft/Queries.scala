package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A registered query: Spark implementation + optional DuckDB oracle SQL.
  * Oracle SQL runs against the same parquet files registered as views named
  * after the tables. Column names/types are aligned on both sides (the
  * driver sorts columns by name and hash-compares values).
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false
)

object Queries {

  /** All registered queries, in registration order. Sections append here. */
  def all: Seq[QueryDef] =
    AnalyticsQueries.defs ++ ReferenceOps.defs ++ TrainingDataOps.defs ++
      CatalogOps.defs ++ EvalOps.defs

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Headline queries timed by Bench (operators, not verification
    * artifacts like full-table ordered dumps or file-rewriting demos).
    */
  def benchQueries: Seq[QueryDef] = all.filter(_.bench)
}
