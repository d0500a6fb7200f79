package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the engine↔fixture contract: the driver regenerates
  * /root/testdata between rounds and has already re-encoded columns
  * (events.ts went TIMESTAMP(NANOS) → TIMESTAMP_NTZ(MICROS) once, taking
  * 11 queries down silently). This spec opens EVERY fixture table at
  * every present SF and asserts the engine-adapted schema, so the next
  * re-encode fails HERE with a message naming the offending physical
  * type — before the driver's correctness gate ever runs.
  *
  * "Engine-adapted" = what the rest of the engine is allowed to assume:
  * raw footer types may vary within the accepted encodings (see
  * Tables.normalizeEventTs), but after adaptation the types below hold.
  */
class FixtureSchemaSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDirs: Seq[String] = {
    val root = new java.io.File("/root/testdata")
    Option(root.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("sf"))
      .map(_.getAbsolutePath).sorted
  }

  /** Timestamp-bearing columns may arrive ns-as-long, NTZ, or
    * tz-adjusted; everything else must match exactly. */
  private val acceptedTs: Set[DataType] =
    Set(LongType, TimestampType, TimestampNTZType)

  private def assertCols(
      table: String, sf: String,
      schema: StructType,
      expected: Seq[(String, Either[DataType, Set[DataType]])]): Unit = {
    val byName = schema.fields.map(f => f.name -> f.dataType).toMap
    val missing = expected.map(_._1).filterNot(byName.contains)
    assert(missing.isEmpty,
      s"$sf/$table.parquet is missing columns $missing — driver fixture " +
        s"layout changed; actual schema: ${schema.simpleString}")
    expected.foreach {
      case (name, Left(dt)) =>
        assert(byName(name) == dt,
          s"$sf/$table.parquet column `$name` reads as ${byName(name)}, " +
            s"engine expects $dt — the driver re-encoded the fixture; " +
            "extend the adapter (graft.Tables) for the new physical type")
      case (name, Right(dts)) =>
        assert(dts.contains(byName(name)),
          s"$sf/$table.parquet column `$name` reads as ${byName(name)}, " +
            s"not one of the accepted encodings $dts — extend " +
            "Tables.normalizeEventTs for the new physical type")
    }
  }

  test("fixture dirs exist") {
    assert(sfDirs.nonEmpty, "/root/testdata has no sf* dirs")
  }

  test("normalizeEventTs: all three encodings of one instant agree to the ms") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 2024-03-01T12:34:56.789 UTC, expressed as each accepted encoding.
    // The NTZ arm relies on the UTC session timezone (pinned above, as in
    // Verify/Bench): if that pin ever drifts, the cast reinterprets wall
    // time in the wrong zone and this equality breaks loudly.
    val ms = 1709296496789L
    val asLong = Seq(Tuple1(ms * 1000000L)).toDF("ts") // ns-as-long
    val asTs = Seq(Tuple1(ms)).toDF("ms")
      .select(expr("timestamp_millis(ms)").as("ts"))
    val asNtz = Seq(Tuple1(ms)).toDF("ms")
      .select(expr("timestamp_millis(ms)")
        .cast(TimestampNTZType).as("ts"))
    for ((df, tag) <- Seq((asLong, "ns-as-long"), (asTs, "timestamp"),
        (asNtz, "timestamp_ntz"))) {
      val out = Tables.normalizeEventTs(df)
      assert(out.schema("ts").dataType == TimestampType,
        s"$tag: normalized type is ${out.schema("ts").dataType}")
      val got = out.select(unix_millis(col("ts"))).head.getLong(0)
      assert(got == ms, s"$tag: epoch-ms $got != $ms after normalization")
    }
  }

  test("normalizeTsCols: both accepted date encodings agree to the ms") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the date-bearing TPC-H columns accept {TIMESTAMP, TIMESTAMP_NTZ}
    // (never ns-as-long); both must normalize to the same TimestampType
    // instant so date-literal filters can't shift under a driver
    // re-encode. NTZ exactness relies on the pinned UTC session.
    val ms = 1709296496789L
    val asTs = Seq(Tuple1(ms)).toDF("ms")
      .select(expr("timestamp_millis(ms)").as("l_shipdate"))
    val asNtz = Seq(Tuple1(ms)).toDF("ms")
      .select(expr("timestamp_millis(ms)")
        .cast(TimestampNTZType).as("l_shipdate"))
    for ((df, tag) <- Seq((asTs, "timestamp"), (asNtz, "timestamp_ntz"))) {
      val out = Tables.normalizeTsCols(df, "l_shipdate")
      assert(out.schema("l_shipdate").dataType == TimestampType,
        s"$tag: normalized type is ${out.schema("l_shipdate").dataType}")
      val got = out.select(unix_millis(col("l_shipdate"))).head.getLong(0)
      assert(got == ms, s"$tag: epoch-ms $got != $ms after normalization")
    }
  }

  for (sf <- sfDirs) {
    test(s"$sf: events raw ts is an accepted encoding; adapted ts is TimestampType") {
      val raw = spark.read.parquet(s"$sf/events.parquet")
      assertCols("events", sf, raw.schema, Seq(
        "event_id" -> Left(LongType), "ts" -> Right(acceptedTs),
        "user_id" -> Left(LongType), "event_type" -> Left(StringType),
        "value" -> Left(DoubleType), "props" -> Left(StringType)))
      val adapted = Tables.events(spark, sf).schema("ts").dataType
      assert(adapted == TimestampType,
        s"Tables.events adapted ts to $adapted, engine contract is " +
          "TimestampType — normalizeEventTs doesn't cover the fixture's " +
          s"physical type ${raw.schema("ts").dataType}")
    }

    test(s"$sf: TPC-H tables match the engine contract") {
      assertCols("lineitem", sf,
        spark.read.parquet(s"$sf/lineitem.parquet").schema, Seq(
          "l_orderkey" -> Left(LongType), "l_partkey" -> Left(LongType),
          "l_suppkey" -> Left(LongType), "l_linenumber" -> Left(IntegerType),
          "l_quantity" -> Left(DoubleType),
          "l_extendedprice" -> Left(DoubleType),
          "l_discount" -> Left(DoubleType), "l_tax" -> Left(DoubleType),
          "l_returnflag" -> Left(StringType),
          "l_linestatus" -> Left(StringType),
          "l_shipdate" -> Right(acceptedTs - LongType)))
      assertCols("orders", sf,
        spark.read.parquet(s"$sf/orders.parquet").schema, Seq(
          "o_orderkey" -> Left(LongType), "o_custkey" -> Left(LongType),
          "o_orderstatus" -> Left(StringType),
          "o_totalprice" -> Left(DoubleType),
          "o_orderdate" -> Right(acceptedTs - LongType),
          "o_orderpriority" -> Left(StringType)))
      // the adapter route (Tables.lineitem/orders) must yield the one
      // type the engine is allowed to assume, whichever accepted
      // encoding the driver emitted
      assert(Tables.lineitem(spark, sf).schema("l_shipdate").dataType
        == TimestampType, "Tables.lineitem must normalize l_shipdate")
      assert(Tables.orders(spark, sf).schema("o_orderdate").dataType
        == TimestampType, "Tables.orders must normalize o_orderdate")
      assertCols("customer", sf,
        spark.read.parquet(s"$sf/customer.parquet").schema, Seq(
          "c_custkey" -> Left(LongType), "c_name" -> Left(StringType),
          "c_nationkey" -> Left(IntegerType),
          "c_acctbal" -> Left(DoubleType),
          "c_mktsegment" -> Left(StringType)))
      assertCols("supplier", sf,
        spark.read.parquet(s"$sf/supplier.parquet").schema, Seq(
          "s_suppkey" -> Left(LongType), "s_name" -> Left(StringType),
          "s_nationkey" -> Left(IntegerType),
          "s_acctbal" -> Left(DoubleType)))
      assertCols("part", sf,
        spark.read.parquet(s"$sf/part.parquet").schema, Seq(
          "p_partkey" -> Left(LongType), "p_name" -> Left(StringType),
          "p_brand" -> Left(StringType), "p_type" -> Left(StringType),
          "p_size" -> Left(IntegerType),
          "p_retailprice" -> Left(DoubleType)))
      assertCols("nation", sf,
        spark.read.parquet(s"$sf/nation.parquet").schema, Seq(
          "n_nationkey" -> Left(IntegerType), "n_name" -> Left(StringType),
          "n_regionkey" -> Left(IntegerType)))
      assertCols("region", sf,
        spark.read.parquet(s"$sf/region.parquet").schema, Seq(
          "r_regionkey" -> Left(IntegerType), "r_name" -> Left(StringType)))
    }

    test(s"$sf: documents and embeddings match the engine contract") {
      assertCols("documents", sf,
        spark.read.parquet(s"$sf/documents.parquet").schema, Seq(
          "doc_id" -> Left(LongType), "text" -> Left(StringType),
          "lang" -> Left(StringType), "source" -> Left(StringType),
          "n_chars" -> Left(LongType)))
      assertCols("embeddings", sf,
        spark.read.parquet(s"$sf/embeddings.parquet").schema, Seq(
          "vec_id" -> Left(LongType),
          "embedding" -> Left(ArrayType(FloatType, containsNull = true)),
          "label" -> Left(IntegerType)))
    }
  }
}
