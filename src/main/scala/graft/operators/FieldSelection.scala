package graft.operators

import org.apache.spark.sql.DataFrame

/** Field selection rules: `all` / include / exclude with `essentialFields`
  * that are always kept, mirroring the reference's
  * `fieldSelectionRule` settings (/root/reference
  * stream-spec-yaml-example.yaml:99-103) and `FieldFilteringTransformer`
  * (/root/reference/src/main/scala/main.scala:89).
  *
  * Pure projection — Catalyst prunes the parquet scan to exactly the kept
  * columns (verified via ReadSchema in the spec), so at 100 TB the unread
  * columns cost nothing.
  */
object FieldSelection {
  sealed trait Rule
  case object All                              extends Rule
  final case class Include(fields: Set[String]) extends Rule
  final case class Exclude(fields: Set[String]) extends Rule

  def apply(df: DataFrame, rule: Rule, essential: Set[String] = Set.empty): DataFrame = {
    val keep: String => Boolean = rule match {
      case All              => _ => true
      case Include(fields)  => c => fields.contains(c) || essential.contains(c)
      case Exclude(fields)  => c => !fields.contains(c) || essential.contains(c)
    }
    // preserve original column order for schema stability
    df.select(df.columns.filter(keep).map(df.col).toIndexedSeq: _*)
  }
}
