package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers over the driver-generated fixture tables (TESTDATA.md).
  * Mirrors the reference's ingest surface (SURVEY.md §2.1 S1-S3):
  * parquet scans with schema from footer; recursive lookup available.
  */
object Tables {
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Targeted scan-split parallelism floor (r17): a compact fixture
    * table reads as 1–3 parquet splits (one file, one row group), so a
    * chain whose expensive per-row work sits BEFORE the first exchange
    * — tokenization, n-gram explode, multi-distinct Expand — runs on
    * 1–3 of the cluster's cores (`spark.sql.files.minPartitionNum`
    * cannot help: a single row group is not splittable). This spreads
    * the frame round-robin to the cluster's parallelism, ONLY when its
    * current partitioning is below it — a 100 TB table already carries
    * more splits than cores and gets NO added shuffle.
    *
    * Deliberately NOT applied to every fixture read: a blanket spread
    * was measured (r17) to cost +0.2–0.6 s on scan-light queries (the
    * extra exchange outweighs parallel scanning when the per-row work
    * is cheap — q01 0.20→0.49 s, q03 0.86→1.48 s), while the
    * compute-bound chains won 2–2.5x. Call sites opt in exactly where
    * the measurement says the scan stage is the bottleneck (r18: the
    * tokenize/shingle/Expand operators — Text.shingledFrom and the
    * minhash/curation chains, Hygiene's gram operators,
    * Extended.profile).
    * Deterministic under retry (sort-before-repartition is on by
    * default) and transparent to pushdown (Catalyst moves filters and
    * pruning through a Repartition node down to the scan). Partition
    * counts probe via physical planning only — never a job. */
  private[graft] def spreadSmall(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.queryExecution.toRdd.getNumPartitions < p) df.repartition(p)
    else df
  }

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
