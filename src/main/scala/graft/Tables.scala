package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers over the driver-generated fixture tables (TESTDATA.md).
  * Mirrors the reference's ingest surface (SURVEY.md §2.1 S1-S3):
  * parquet scans with schema from footer; recursive lookup available.
  */
object Tables {
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Normalize NTZ-encoded timestamp fixture columns to TimestampType —
    * exact under the pinned-UTC session (Verify/Bench/specs), matching
    * DuckDB's naive-timestamp epoch math. The date-bearing TPC-H columns
    * (l_shipdate, o_orderdate) route through this so a driver re-encode
    * TIMESTAMP → TIMESTAMP_NTZ (the r8 events.ts incident) changes
    * nothing downstream: date-literal filters and oracle parity hold for
    * both encodings, and FixtureSchemaSpec pins the accepted set.
    */
  private[graft] def normalizeTsCols(df: DataFrame, cols: String*): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    cols.foldLeft(df) { (d, c) =>
      if (d.schema(c).dataType == TimestampNTZType)
        d.withColumn(c, col(c).cast(TimestampType))
      else d
    }
  }

  def lineitem(s: SparkSession, d: String): DataFrame =
    normalizeTsCols(t(s, d, "lineitem"), "l_shipdate")
  def orders(s: SparkSession, d: String): DataFrame =
    normalizeTsCols(t(s, d, "orders"), "o_orderdate")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  /** Normalize the events `ts` column to TimestampType across every
    * physical encoding the driver's fixture generator has produced:
    *
    *  - TIMESTAMP(NANOS): Spark's parquet reader rejects it outright;
    *    with spark.sql.legacy.parquet.nanosAsLong=true (set by
    *    Verify/Bench/specs) it reads as ns-since-epoch LongType,
    *    converted here to a µs TimestampType. Oracle SQL compares in
    *    epoch-ms space so the ns→µs truncation can't skew results.
    *  - TIMESTAMP_NTZ(MICROS) (isAdjustedToUTC=0): reads as
    *    TimestampNTZType; cast to TimestampType. The session timezone is
    *    pinned UTC in Verify/Bench/specs, so the reinterpretation is
    *    exact and matches DuckDB's naive-timestamp epoch-ms math.
    *  - TIMESTAMP(MICROS/MILLIS) tz-adjusted: already TimestampType.
    *
    * Works on batch and streaming frames alike (pure schema-driven
    * column rewrite). Every reader of the events fixture — batch
    * (`Tables.events`) and the stream staging sites in ops/Events — MUST
    * route through this one function so a driver-side fixture re-encode
    * breaks exactly one spec (FixtureSchemaSpec), not eleven queries.
    */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  }

  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(t(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}

/** One engine query: Spark-side plan builder + optional DuckDB oracle SQL
  * (same column names/aliases on both sides — the driver's compare sorts
  * columns by name before hashing). Queries without SQL-expressible
  * semantics omit the oracle (driver records rows-only check).
  */
final case class GQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
