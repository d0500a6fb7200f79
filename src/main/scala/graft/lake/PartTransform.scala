package graft.lake

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Hidden-partitioning transforms (Iceberg's partition-spec transforms,
  * re-expressed over the engine's shadow-column write path): a partition
  * LEVEL may be a pure function of a source column instead of the column
  * itself. Data files keep the source column untouched — the transform
  * exists only in directory naming and file-level pruning, so queries
  * filter on the SOURCE column and never need to know the layout
  * (Iceberg spec §Partition Transforms; Spark's own DSv2
  * `org.apache.spark.sql.connector.expressions.Transform` surface).
  *
  * Every transform's rendered value is SESSION-TIMEZONE-FREE by
  * construction (time transforms use epoch arithmetic on the instant,
  * never a localized format), so a writer and reader in different
  * sessions always agree on directory membership — the property the
  * identity render can only guarantee for non-timestamp types.
  *
  * Spec strings (persisted in the table descriptor): `identity`,
  * `years`, `months`, `days`, `hours`, `bucket[N]`, `truncate[W]`.
  */
sealed abstract class PartTransform(val spec: String) {
  /** level directory suffix: identity levels keep the bare column name */
  def levelSuffix: String = spec.takeWhile(_ != '[')

  /** the UNRENDERED transform value of `c` (typed `dt`); null in → null
    * out for every transform, so null source rows land in the null-
    * sentinel directory exactly like identity partitioning */
  def expr(c: Column, dt: DataType): Column

  def validFor(dt: DataType): Boolean

  /** true when the rendered-string ORDER of transform values equals the
    * source-value order for values rendering at a fixed width — the
    * precondition for range-predicate directory pruning. The pruner
    * additionally keeps any level whose rendered width differs from the
    * bound's (years beyond [1000, 9999] etc. stay conservative). */
  def orderPreserving: Boolean
}

object PartTransform {

  case object Identity extends PartTransform("identity") {
    override def expr(c: Column, dt: DataType): Column = c
    override def validFor(dt: DataType): Boolean = true
    override def orderPreserving: Boolean = false // identity pruning has its own exact path
  }

  private val MicrosPerDay = 86400000000L
  private val MicrosPerHour = 3600000000L

  /** floor division in long space: (m - pmod(m, d)) is always an exact
    * multiple of d, so the division is exact (and floor-correct for
    * negative instants — pre-epoch timestamps — because pmod is
    * non-negative). Exact up to |micros| < 2^53 (years ±285k…±287k),
    * far past any parquet-storable timestamp's useful range. */
  private def floorDiv(m: Column, d: Long): Column =
    ((m - pmod(m, lit(d))) / lit(d)).cast(LongType)

  /** epoch-day ordinal of a timestamp column as a DATE — pure instant
    * arithmetic (unix_micros is timezone-free), never a localized render */
  private def utcDate(c: Column): Column =
    date_from_unix_date(floorDiv(unix_micros(c), MicrosPerDay).cast(IntegerType))

  /** ISO `yyyy-MM-dd…` string of the source value, timezone-free per
    * type: DateType/TimestampNTZ cast-to-string is calendar arithmetic;
    * TimestampType routes through epoch-day/hour ordinals */
  private def isoPrefix(c: Column, dt: DataType, len: Int): Column = dt match {
    case TimestampType => substring(utcDate(c).cast(StringType), 1, len)
    case _ => substring(c.cast(StringType), 1, len)
  }

  case object Years extends PartTransform("years") {
    override def expr(c: Column, dt: DataType): Column = isoPrefix(c, dt, 4)
    override def validFor(dt: DataType): Boolean =
      dt == DateType || dt == TimestampType || dt == TimestampNTZType
    override def orderPreserving: Boolean = true
  }

  case object Months extends PartTransform("months") {
    override def expr(c: Column, dt: DataType): Column = isoPrefix(c, dt, 7)
    override def validFor(dt: DataType): Boolean = Years.validFor(dt)
    override def orderPreserving: Boolean = true
  }

  case object Days extends PartTransform("days") {
    override def expr(c: Column, dt: DataType): Column = isoPrefix(c, dt, 10)
    override def validFor(dt: DataType): Boolean = Years.validFor(dt)
    override def orderPreserving: Boolean = true
  }

  case object Hours extends PartTransform("hours") {
    override def expr(c: Column, dt: DataType): Column = dt match {
      case TimestampType =>
        val hourOrd = floorDiv(unix_micros(c), MicrosPerHour)
        concat(utcDate(c).cast(StringType), lit("-"),
          lpad(pmod(hourOrd, lit(24L)).cast(StringType), 2, "0"))
      case _ => // TimestampNTZ: `yyyy-MM-dd HH:…` string, splice the hour
        concat(substring(c.cast(StringType), 1, 10), lit("-"),
          substring(c.cast(StringType), 12, 2))
    }
    override def validFor(dt: DataType): Boolean =
      dt == TimestampType || dt == TimestampNTZType
    override def orderPreserving: Boolean = true
  }

  final case class Bucket(n: Int) extends PartTransform(s"bucket[$n]") {
    require(n > 0, s"bucket transform needs a positive bucket count, got $n")
    override def levelSuffix: String = "bucket"
    // Spark's Murmur3 `hash` is deterministic across sessions/versions of
    // this engine (not Iceberg's registered bucket function — directory
    // layouts are engine-private, semantics match). hash() never returns
    // null, so null routes to the sentinel explicitly.
    override def expr(c: Column, dt: DataType): Column =
      when(c.isNull, lit(null).cast(IntegerType))
        .otherwise(pmod(hash(c), lit(n)))
    override def validFor(dt: DataType): Boolean = true
    override def orderPreserving: Boolean = false
  }

  final case class Truncate(w: Int) extends PartTransform(s"truncate[$w]") {
    require(w > 0, s"truncate transform needs a positive width, got $w")
    override def levelSuffix: String = "truncate"
    override def expr(c: Column, dt: DataType): Column = dt match {
      case StringType => substring(c, 1, w)
      case _ => c - pmod(c, lit(w.toLong)) // Iceberg def: v - (v mod W) ≥ 0 remainder
    }
    override def validFor(dt: DataType): Boolean = dt match {
      case StringType | ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    override def orderPreserving: Boolean = false
  }

  private val BucketRe = """bucket\[(\d+)\]""".r
  private val TruncateRe = """truncate\[(\d+)\]""".r

  def parse(spec: String): PartTransform = spec match {
    case "identity" | "" | null => Identity
    case "years" => Years
    case "months" => Months
    case "days" => Days
    case "hours" => Hours
    case BucketRe(n) => Bucket(n.toInt)
    case TruncateRe(w) => Truncate(w.toInt)
    case other => throw new IllegalArgumentException(
      s"unknown partition transform '$other' " +
        "(expected identity|years|months|days|hours|bucket[N]|truncate[W])")
  }
}
