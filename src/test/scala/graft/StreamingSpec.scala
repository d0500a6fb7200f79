package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.lake.{LakeTable, LakeTableConfig}
import graft.streaming.Streaming

/** Streaming ingest + event-time windows (SURVEY.md §7.2 step 6):
  * micro-batch upserts through foreachBatch must equal the same batches
  * upserted directly; windowed streaming aggregation must equal its batch
  * expression.
  */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def batchDf(rows: (Long, Int, String, Int)*): DataFrame = {
    import spark.implicits._
    rows.toDF("pk", "vendorid", "payload", "ts")
  }

  test("foreachBatch upsert stream equals direct batch upserts") {
    val src = tmp("stream-src")
    val b1 = batchDf((1L, 1, "a", 1), (2L, 2, "b", 1))
    val b2 = batchDf((1L, 1, "a2", 2), (3L, 1, "c", 2))      // update + insert
    val b3 = batchDf((1L, 1, "stale", 0))                     // late, must lose

    val streamed = LakeTable(spark, LakeTableConfig(
      tmp("stream-tbl"), Seq("pk"), "ts", Seq("vendorid")))
    b1.write.parquet(s"$src/b1")
    val q = spark.readStream.schema(b1.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$src/*")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        streamed.upsert(batch.toDF()); ()
      }
      .option("checkpointLocation", tmp("stream-ckpt"))
      .start()
    try {
      q.processAllAvailable()
      b2.write.parquet(s"$src/b2")
      b3.write.parquet(s"$src/b3")
      q.processAllAvailable()
    } finally q.stop()

    val direct = LakeTable(spark, LakeTableConfig(
      tmp("direct-tbl"), Seq("pk"), "ts", Seq("vendorid")))
    Seq(b1, b2, b3).foreach(direct.upsert(_))

    import spark.implicits._
    def snap(t: LakeTable) = t.read()
      .select($"pk", $"vendorid", $"payload", $"ts")
      .as[(Long, Int, String, Int)].collect().toSet
    assert(snap(streamed) == snap(direct))
    assert(snap(streamed) == Set((1L, 1, "a2", 2), (2L, 2, "b", 1), (3L, 1, "c", 2)))
    // micro-batching actually happened (maxFilesPerTrigger=1 → >= 3 commits)
    assert(streamed.log.commits.size >= 3)
  }

  test("writeStream.format(graft) sink equals direct batch upserts") {
    val src = tmp("sink-src")
    val root = tmp("sink-tbl") + "/t"
    val b1 = batchDf((1L, 1, "a", 1), (2L, 2, "b", 1))
    val b2 = batchDf((1L, 1, "a2", 2), (3L, 1, "c", 2))
    val b3 = batchDf((1L, 1, "stale", 0))
    b1.write.parquet(s"$src/b1")
    val q = spark.readStream.schema(b1.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$src/*")
      .writeStream.format("graft")
      .option("path", root)
      .option("keyCols", "pk")
      .option("precombineCol", "ts")
      .option("partitionCols", "vendorid")
      .option("checkpointLocation", tmp("sink-ckpt"))
      .start()
    try {
      q.processAllAvailable()
      b2.write.parquet(s"$src/b2")
      b3.write.parquet(s"$src/b3")
      q.processAllAvailable()
    } finally q.stop()
    val t = LakeTable(spark, LakeTableConfig(root, Seq("pk"), "ts", Seq("vendorid")))
    import spark.implicits._
    val got = t.read().select($"pk", $"vendorid", $"payload", $"ts")
      .as[(Long, Int, String, Int)].collect().toSet
    assert(got == Set((1L, 1, "a2", 2), (2L, 2, "b", 1), (3L, 1, "c", 2)))
    assert(t.log.commits.size >= 3)
  }

  test("graft sink skips a replayed batch id (exactly-once after restart)") {
    val root = tmp("sink-idem") + "/t"
    val t = LakeTable(spark, LakeTableConfig(root, Seq("pk"), "ts", Seq("vendorid")))
    val sink = new graft.sources.GraftSink(t,
      spark.sparkContext.hadoopConfiguration)
    sink.addBatch(0, batchDf((1L, 1, "v0", 1)))
    val commitsAfterFirst = t.log.commits.size
    // Structured Streaming re-delivers the in-flight batch on restart —
    // same id must be a no-op even with DIFFERENT (stale) content
    sink.addBatch(0, batchDf((1L, 1, "replay-garbage", 9)))
    assert(t.log.commits.size == commitsAfterFirst)
    sink.addBatch(1, batchDf((2L, 1, "v1", 1)))
    import spark.implicits._
    val got = t.read().select($"pk", $"payload").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "v0"), (2L, "v1")))
  }

  test("flatMapGroupsWithState keeps running per-user totals across batches") {
    import spark.implicits._
    import graft.streaming.Streaming.{UserEvent, UserTotal}
    val src = tmp("state-src")
    Seq(UserEvent(1L, 10.0), UserEvent(2L, 5.0)).toDS()
      .write.parquet(s"$src/b1")
    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[UserEvent]].schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$src/*").as[UserEvent]
    val q = graft.streaming.Streaming.runningTotals(stream)
      .writeStream.outputMode("update")
      .format("memory").queryName("totals")
      .start()
    try {
      q.processAllAvailable()
      Seq(UserEvent(1L, 2.5), UserEvent(3L, 1.0)).toDS()
        .write.parquet(s"$src/b2")
      q.processAllAvailable()
    } finally q.stop()
    // last update per user reflects accumulated state across micro-batches
    val last = spark.table("totals").as[UserTotal].collect()
      .groupBy(_.userId).map { case (u, rows) => u -> rows.maxBy(_.events) }
    assert(last(1L) == UserTotal(1L, 2, 12.5))
    assert(last(2L) == UserTotal(2L, 1, 5.0))
    assert(last(3L) == UserTotal(3L, 1, 1.0))
  }

  test("runningCents accumulates exact integer totals across batches") {
    import spark.implicits._
    import graft.streaming.Streaming.{UserCents, UserCentsTotal}
    val src = tmp("cents-src")
    Seq(UserCents(1L, 1000), UserCents(2L, 500)).toDS()
      .write.parquet(s"$src/b1")
    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[UserCents]].schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$src/*").as[UserCents]
    val q = graft.streaming.Streaming.withRocksDbStateStore(spark) {
      graft.streaming.Streaming.runningCents(stream)
        .writeStream.outputMode("update")
        .format("memory").queryName("cents_totals")
        .start()
    }
    try {
      q.processAllAvailable()
      Seq(UserCents(1L, 250), UserCents(3L, 100)).toDS()
        .write.parquet(s"$src/b2")
      q.processAllAvailable()
    } finally q.stop()
    val last = spark.table("cents_totals").as[UserCentsTotal].collect()
      .groupBy(_.user_id).map { case (u, rows) => u -> rows.maxBy(_.n_events) }
    assert(last(1L) == UserCentsTotal(1L, 2, 1250))
    assert(last(2L) == UserCentsTotal(2L, 1, 500))
    assert(last(3L) == UserCentsTotal(3L, 1, 100))
  }

  test("watermark: late events beyond the delay are dropped, windows emit once") {
    import spark.implicits._
    val src = tmp("wm-src")
    def ev(hhmm: String, v: Double) =
      (java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00"), "click", 0L, 0L, v)
    def write(name: String, rows: (java.sql.Timestamp, String, Long, Long, Double)*): Unit =
      rows.toSeq.toDF("ts", "event_type", "event_id", "user_id", "value")
        .write.parquet(s"$src/$name")

    write("b1", ev("00:10", 1), ev("00:20", 1), ev("01:10", 1))
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$src/b1").schema)
      .parquet(s"$src/*")
    val q = graft.streaming.Streaming.hourlyCounts(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("wm_hourly")
      .start()
    try {
      q.processAllAvailable()
      // advances the watermark to 03:00 on the NEXT batch
      write("b2", ev("05:00", 1))
      q.processAllAvailable()
      // 00:30 is behind the 03:00 watermark -> dropped; hour-0/1 emit final
      write("b3", ev("00:30", 99), ev("05:30", 1))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("wm_hourly")
      .select($"hour_ms", $"n_events").as[(Long, Long)].collect().toList
    val hour0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val hour1 = java.sql.Timestamp.valueOf("2024-01-01 01:00:00").getTime
    // exactly one emission per finalized window, late row NOT counted
    assert(rows.count(_._1 == hour0) == 1)
    assert(rows.find(_._1 == hour0).get._2 == 2L)
    assert(rows.find(_._1 == hour1).get._2 == 1L)
  }

  test("streaming session_window equals the batch session_window") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(min: Long) = new Timestamp(min * 60000L)
    // user 1: two sessions (gap 40min > 30min); user 2: one session
    val rows = Seq(
      (1L, t(0)), (1L, t(10)), (1L, t(20)),
      (1L, t(60)), (1L, t(65)),
      (2L, t(5)))
    val mem = MemoryStream[(Long, Timestamp)]
    mem.addData(rows: _*)
    val sessions = Streaming.sessionCounts(
      mem.toDF().select($"_1".as("user_id"), $"_2".as("ts")))
    val q = sessions.writeStream.outputMode("complete")
      .format("memory").queryName("sess_sink").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("sess_sink")
      .as[(Long, Long, Long, Long)].collect().toSet
    val batch = Streaming.sessionCounts(
      rows.toDF("user_id", "ts"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(streamed.map(r => (r._1, r._4)) == Set((1L, 3L), (1L, 2L), (2L, 1L)),
      s"session shapes wrong: $streamed")
  }

  test("streaming windowed aggregation equals the batch expression") {
    val sf = "/root/testdata/sf0.001"
    val batchEvents = Tables.events(spark, sf)
    val expected = SparkEntry.queries("ev_hourly_tumbling")(spark, sf).collect().toSet

    // streaming source needs a directory; stage the single-file fixture
    val srcDir = tmp("stream-events")
    Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(s"$srcDir/events.parquet"))
    val stream = Tables.normalizeEventTs(spark.readStream
      .schema(spark.read.parquet(s"$sf/events.parquet").schema)
      .parquet(srcDir))
    val q = Streaming.hourlyCounts(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("hourly")
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("hourly")
      .orderBy("hour_ms", "event_type").collect().toSet
    assert(got == expected)
  }

  test("dropDuplicatesWithinWatermark dedups across micro-batches, bounded state") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // offset away from epoch 0: the INITIAL watermark is 0, and an event
    // at exactly t=0 is already "late" (ts <= watermark drops) — a row
    // at the epoch would silently vanish from the first batch
    def t(min: Long) = new Timestamp((min + 1000) * 60000L)
    val mem = MemoryStream[(String, Timestamp)]
    val dedup = Streaming.dedupStream(
      mem.toDF().select($"_1".as("doc_hash"), $"_2".as("ts")),
      "doc_hash", delay = "10 minutes")
    val q = dedup.writeStream.outputMode("append")
      .format("memory").queryName("dedup_sink").start()
    try {
      // batch 1: duplicate INSIDE one batch collapses; two distinct keys
      mem.addData(("a", t(0)), ("a", t(1)), ("b", t(0)))
      q.processAllAvailable()
      // batch 2: 'a' again within the delay -> suppressed; 'c' is new
      mem.addData(("a", t(5)), ("c", t(6)))
      q.processAllAvailable()
      // batch 3: advance event time far past the watermark so 'a' state
      // expires, then 'a' REAPPEARS beyond the delay -> emitted again
      // (the documented contract: only within-window duplicates dedup)
      mem.addData(("z", t(100)))
      q.processAllAvailable()
      mem.addData(("a", t(101)))
      q.processAllAvailable()
    } finally q.stop()
    val emitted = spark.table("dedup_sink")
      .select($"doc_hash").as[String].collect().toSeq
    assert(emitted.count(_ == "a") == 2,
      s"'a' must emit once per watermark window, got $emitted")
    assert(emitted.count(_ == "b") == 1 && emitted.count(_ == "c") == 1,
      s"unexpected emissions: $emitted")
  }
}
