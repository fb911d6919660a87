package graft.catalog

import org.apache.spark.sql.connector.expressions.aggregate._
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Metadata-only aggregate evaluation from manifest statistics —
  * `SELECT count(*), min(x), max(x) FROM t` answered without reading a
  * single data file, the classic table-format fast path (Iceberg/Delta
  * do the same from their file metrics). Strictly conservative: any
  * filter, group-by, position delete, distinct, or missing per-file
  * stat refuses the pushdown and the query falls back to a normal
  * scan — the fast path can only ever return what a full scan would.
  */
object GraftMetadataAgg {

  /** Values (internal representation, aggregate order) if every
    * aggregate in `agg` is exactly answerable from the manifest.
    */
  def tryCompute(snapshot: GraftSnapshot, agg: Aggregation): Option[Seq[Any]] = {
    if (agg.groupByExpressions().nonEmpty) return None
    if (snapshot.deletes.nonEmpty) return None // deleted rows not in stats
    if (snapshot.eqDeletes.nonEmpty) return None // eq-deleted row count unknown
    val files = snapshot.files
    val schema = snapshot.schema

    def colName(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case r: NamedReference if r.fieldNames().length == 1 => Some(r.fieldNames()(0))
        case _ => None
      }
    def dtOf(c: String): Option[DataType] = schema.fields.find(_.name == c).map(_.dataType)

    val values = agg.aggregateExpressions().map {
      case _: CountStar =>
        Some(files.map(_.rows).sum: Any)
      case c: Count if !c.isDistinct =>
        for {
          col <- colName(c.column())
          if files.forall(_.stats.contains(col))
        } yield files.map(f => f.rows - f.stats(col).nulls).sum: Any
      case m: Min =>
        for {
          col <- colName(m.column()); dt <- dtOf(col)
          vals <- statValues(files, col, dt, _.min)
        } yield vals.reduceLeft((a, b) => if (cmp(a, b) <= 0) a else b)
      case m: Max =>
        for {
          col <- colName(m.column()); dt <- dtOf(col)
          vals <- statValues(files, col, dt, _.max)
        } yield vals.reduceLeft((a, b) => if (cmp(a, b) >= 0) a else b)
      case _ => None // sum/avg/distinct: not derivable from min/max stats
    }
    if (values.exists(_.isEmpty)) None else Some(values.map(_.get).toSeq)
  }

  /** Per-file stat values in internal representation; None if any file
    * lacks the stat (dropped, unsupported type, or all-null column —
    * an all-null column would make min/max null, which plain min/max
    * ignores ONLY if other files carry values; to stay exact we refuse
    * unless every row-bearing file has the stat and no file is
    * all-null-with-rows).
    */
  private def statValues(
      files: Seq[FileEntry], col: String, dt: DataType,
      pick: ColStats => Option[String]): Option[Seq[Any]] = {
    val active = files.filter(_.rows > 0)
    if (active.isEmpty) return None // empty table: min/max is NULL; skip fast path
    val picked = active.map { f =>
      f.stats.get(col).filter(_.nulls < f.rows).flatMap(pick).flatMap(internalValue(_, dt))
    }
    // a file whose rows are all null contributes nothing to min/max and
    // is fine to skip; a file with non-null rows but no stat is not
    val ok = active.zip(picked).forall { case (f, v) =>
      v.isDefined || f.stats.get(col).exists(_.nulls == f.rows)
    }
    val vals = picked.flatten
    if (!ok || vals.isEmpty) None else Some(vals)
  }

  /** Scan output schema for a successfully pushed aggregation: one
    * field per aggregate (counts are BIGINT, min/max keep the column
    * type). Only called after [[tryCompute]] accepted `agg`.
    */
  def outputSchema(agg: Aggregation, schema: StructType): StructType = {
    def dtOf(e: org.apache.spark.sql.connector.expressions.Expression): DataType = e match {
      case r: NamedReference => schema.fields.find(_.name == r.fieldNames()(0)).get.dataType
      case other => sys.error(s"unexpected aggregate child $other")
    }
    StructType(agg.aggregateExpressions().zipWithIndex.map {
      case (_: CountStar, i) => StructField(s"agg_$i", LongType, nullable = false)
      case (c: Count, i) => StructField(s"agg_$i", LongType, nullable = false)
      case (m: Min, i) => StructField(s"agg_$i", dtOf(m.column()), nullable = true)
      case (m: Max, i) => StructField(s"agg_$i", dtOf(m.column()), nullable = true)
      case (other, _) => sys.error(s"unexpected pushed aggregate $other")
    }.toIndexedSeq)
  }

  /** Parse a manifest stat string into Spark's internal value domain. */
  private[catalog] def internalValue(s: String, dt: DataType): Option[Any] =
    try dt match {
      case IntegerType | DateType => Some(s.toInt)
      case LongType | TimestampType | TimestampNTZType => Some(s.toLong)
      case FloatType => Some(s.toFloat)
      case DoubleType => Some(s.toDouble)
      case BooleanType => Some(s.toBoolean)
      case StringType => Some(UTF8String.fromString(s))
      case d: DecimalType => Some(Decimal(new java.math.BigDecimal(s), d.precision, d.scale))
      case _ => None
    } catch { case _: NumberFormatException => None }

  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: Int, y: Int) => Integer.compare(x, y)
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case (x: Float, y: Float) => java.lang.Float.compare(x, y)
    case (x: Double, y: Double) => java.lang.Double.compare(x, y)
    case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
    case (x: UTF8String, y: UTF8String) => x.compareTo(y)
    case (x: Decimal, y: Decimal) => x.compare(y)
    case _ => 0
  }
}
