package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers over the driver-generated fixture tables (TESTDATA.md).
  * Mirrors the reference's ingest surface (SURVEY.md §2.1 S1-S3):
  * parquet scans with schema from footer; recursive lookup available.
  */
object Tables {
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  /** events.parquet carries TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects; with spark.sql.legacy.parquet.nanosAsLong=true (set by
    * Verify/Bench/specs) it reads as ns-since-epoch LongType, converted
    * here to a µs TimestampType. Oracle SQL compares in epoch-ms space so
    * the ns→µs truncation can't skew results.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = t(s, d, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else raw
  }
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
