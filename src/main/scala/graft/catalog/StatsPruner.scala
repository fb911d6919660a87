package graft.catalog

import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** File-skipping decisions from manifest min/max/null statistics —
  * the same zone-map pruning Iceberg/Delta perform from their file
  * metrics. Strictly conservative: any unknown (missing stats, dropped
  * stat, unsupported filter shape, null literal) answers "may match",
  * so pruning can only skip files that PROVABLY contain no matching
  * row. Filters are additionally re-evaluated row-wise by Spark (the
  * scan reports them as residual), so pruning is a pure I/O
  * optimization, never a correctness dependency.
  */
object StatsPruner {

  /** May `entry` contain a row matching `filter`? */
  def mayMatch(filter: Filter, entry: FileEntry, schema: StructType): Boolean = filter match {
    case And(l, r) => mayMatch(l, entry, schema) && mayMatch(r, entry, schema)
    case Or(l, r) => mayMatch(l, entry, schema) || mayMatch(r, entry, schema)
    case EqualTo(a, v) => rangeOverlaps(a, v, v, entry, schema)
    case EqualNullSafe(a, v) =>
      if (v == null) hasNulls(a, entry) else rangeOverlaps(a, v, v, entry, schema)
    case GreaterThan(a, v) => cmpMax(a, v, entry, schema)(_ > 0)
    case GreaterThanOrEqual(a, v) => cmpMax(a, v, entry, schema)(_ >= 0)
    case LessThan(a, v) => cmpMin(a, v, entry, schema)(_ < 0)
    case LessThanOrEqual(a, v) => cmpMin(a, v, entry, schema)(_ <= 0)
    case In(a, vs) =>
      if (vs == null || vs.isEmpty) true
      else vs.exists(v => rangeOverlaps(a, v, v, entry, schema))
    case IsNull(a) => hasNulls(a, entry)
    case IsNotNull(a) => entry.stats.get(a).forall(_.nulls < entry.rows)
    case StringStartsWith(a, p) => startsWithMayMatch(a, p, entry)
    case _ => true // Not / string contains / unknown: conservative
  }

  private def hasNulls(col: String, entry: FileEntry): Boolean =
    entry.stats.get(col).forall(_.nulls > 0)

  /** May `entry` contain a row where `col` equals ANY of `values`,
    * where values are in Catalyst's INTERNAL domain (UTF8String,
    * epoch-day Int, epoch-micro Long, Decimal) — the domain runtime
    * (DPP) filters arrive in. Conservative like [[mayMatch]]: missing
    * stats or an uninterpretable value answer "may match".
    */
  def mayMatchAnyInternal(col: String, values: Seq[Any], entry: FileEntry, schema: StructType): Boolean = {
    (for {
      st <- entry.stats.get(col)
      dt <- schema.fields.find(_.name == col).map(_.dataType)
      mn <- st.min; mx <- st.max
      sMn <- parseStat(mn, dt); sMx <- parseStat(mx, dt)
    } yield values.exists { v0 =>
      fromInternal(v0) match {
        case None => true // can't interpret → must keep the file
        case Some(v) => cmp(v, sMx, dt) <= 0 && cmp(v, sMn, dt) >= 0
      }
    }).getOrElse(true)
  }

  /** Internal-domain runtime value → the stat compare domain (which is
    * itself internal for dates/timestamps, so most types pass through).
    */
  private def fromInternal(v: Any): Option[Any] = v match {
    case null => None
    case s: org.apache.spark.unsafe.types.UTF8String => Some(s.toString)
    case s: String => Some(s)
    case n: Int => Some(n)
    case n: Long => Some(n)
    case n: Float => Some(n)
    case n: Double => Some(n)
    case b: Boolean => Some(b)
    case d: org.apache.spark.sql.types.Decimal => Some(d.toJavaBigDecimal)
    case d: java.math.BigDecimal => Some(d)
    case _ => None
  }

  /** [lo, hi] (inclusive) overlaps the file's [min, max]? */
  private def rangeOverlaps(col: String, lo: Any, hi: Any, entry: FileEntry, schema: StructType): Boolean = {
    if (lo == null || hi == null) return true
    (for {
      st <- entry.stats.get(col)
      dt <- schema.fields.find(_.name == col).map(_.dataType)
      mn <- st.min; mx <- st.max
      vLo <- normalize(lo, dt); vHi <- normalize(hi, dt)
      sMn <- parseStat(mn, dt); sMx <- parseStat(mx, dt)
    } yield cmp(vLo, sMx, dt) <= 0 && cmp(vHi, sMn, dt) >= 0).getOrElse(true)
  }

  private def cmpMax(col: String, v: Any, entry: FileEntry, schema: StructType)(ok: Int => Boolean): Boolean = {
    if (v == null) return true
    (for {
      st <- entry.stats.get(col)
      dt <- schema.fields.find(_.name == col).map(_.dataType)
      mx <- st.max
      fv <- normalize(v, dt); sMx <- parseStat(mx, dt)
    } yield ok(cmp(sMx, fv, dt))).getOrElse(true)
  }

  private def cmpMin(col: String, v: Any, entry: FileEntry, schema: StructType)(ok: Int => Boolean): Boolean = {
    if (v == null) return true
    (for {
      st <- entry.stats.get(col)
      dt <- schema.fields.find(_.name == col).map(_.dataType)
      mn <- st.min
      fv <- normalize(v, dt); sMn <- parseStat(mn, dt)
    } yield ok(cmp(sMn, fv, dt))).getOrElse(true)
  }

  private def startsWithMayMatch(col: String, prefix: String, entry: FileEntry): Boolean = {
    if (prefix == null) return true
    (for {
      st <- entry.stats.get(col)
      mn <- st.min; mx <- st.max
    } yield {
      // strings with the prefix lie in [prefix, nextAfterPrefix); a file
      // overlaps iff max >= prefix and min is below that upper bound
      mx.compareTo(prefix) >= 0 && (mn.compareTo(prefix) <= 0 || mn.startsWith(prefix))
    }).getOrElse(true)
  }

  /** Normalize a pushed-filter value into the column's internal stat
    * domain (dates -> epoch days, timestamps -> epoch micros, numerics
    * as-is). None = unnormalizable -> no pruning.
    */
  private def normalize(v: Any, dt: DataType): Option[Any] = (dt, v) match {
    case (DateType, d: java.sql.Date) => Some(DateTimeUtils.fromJavaDate(d))
    case (DateType, d: java.time.LocalDate) => Some(DateTimeUtils.localDateToDays(d))
    case (TimestampType, t: java.sql.Timestamp) => Some(DateTimeUtils.fromJavaTimestamp(t))
    case (TimestampType, t: java.time.Instant) => Some(DateTimeUtils.instantToMicros(t))
    case (TimestampNTZType, t: java.time.LocalDateTime) => Some(DateTimeUtils.localDateTimeToMicros(t))
    case (_: DecimalType, d: java.math.BigDecimal) => Some(d)
    case (_: DecimalType, d: BigDecimal) => Some(d.bigDecimal)
    case (StringType, s: String) => Some(s)
    case (BooleanType, b: Boolean) => Some(b)
    case (IntegerType, n: Int) => Some(n)
    case (LongType, n: Long) => Some(n)
    case (FloatType, n: Float) => Some(n)
    case (DoubleType, n: Double) => Some(n)
    // widened literals Spark may hand over
    case (LongType, n: Int) => Some(n.toLong)
    case (DoubleType, n: Float) => Some(n.toDouble)
    case _ => None
  }

  private def parseStat(s: String, dt: DataType): Option[Any] =
    try dt match {
      case IntegerType | DateType => Some(s.toInt)
      case LongType | TimestampType | TimestampNTZType => Some(s.toLong)
      case FloatType => Some(s.toFloat)
      case DoubleType => Some(s.toDouble)
      case StringType => Some(s)
      case BooleanType => Some(s.toBoolean)
      case _: DecimalType => Some(new java.math.BigDecimal(s))
      case _ => None
    } catch { case _: NumberFormatException => None }

  private def cmp(a: Any, b: Any, dt: DataType): Int = (a, b) match {
    case (x: Int, y: Int) => Integer.compare(x, y)
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case (x: Float, y: Float) => java.lang.Float.compare(x, y)
    case (x: Double, y: Double) => java.lang.Double.compare(x, y)
    case (x: String, y: String) => x.compareTo(y)
    case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
    case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.compareTo(y)
    case _ => 0
  }
}
