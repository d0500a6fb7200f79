package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType
import graft.lake.LakeTable

/** Structured Streaming surface (SURVEY.md §2.5 streaming row, §7.2 step 6).
  *
  * The reference simulates CDC with static daily batches
  * (glue/NYTaxiDataPrep.py:25-27) upserted one at a time; the continuous
  * form of that pipeline is `foreachBatch { b => table.upsert(b) }` — each
  * micro-batch gets the same record-keyed precombine merge, so late or
  * out-of-order data is resolved exactly like the reference's day-minus
  * batch (older precombine loses, whenever it arrives).
  *
  * At scale: the upsert stream inherits LakeTable's partition-pruned
  * rewrite, so a micro-batch shuffles only its own keys and rewrites only
  * touched partitions; windowed aggs carry watermarks so state is bounded.
  */
object Streaming {

  /** Continuous ingest: parquet files landing in `srcDir` are upserted
    * into `table` micro-batch by micro-batch. `readOptions` tune the file
    * source (e.g. maxFilesPerTrigger=1 to cap per-micro-batch work).
    */
  def upsertStream(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      table: LakeTable,
      checkpoint: String,
      readOptions: Map[String, String] = Map.empty): StreamingQuery =
    spark.readStream
      .schema(schema)
      .options(readOptions)
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        table.upsert(batch.toDF()); ()
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** Event-time tumbling-window aggregation with a watermark bounding
    * state; `complete` output keeps the comparison with the batch
    * expression (ops.Events "ev_hourly_tumbling") exact.
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .select(unix_millis(col("window.start")).as("hour_ms"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Gap-based sessionization as a STREAMING aggregation: the built-in
    * session_window state machine merges events into sessions as they
    * arrive and the watermark closes sessions `gap` past the last event
    * — the continuous form of the batch lag/sum sessionize
    * (ops.Events "ev_sessionize"). State per open session only; at
    * scale the shuffle is keyed on (user, merged session), exactly the
    * aggregation Spark's incremental planner maintains.
    */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_millis(col("session_window.start")).as("start_ms"),
        unix_millis(col("session_window.end")).as("end_ms"),
        col("n_events"))

  /** Arbitrary stateful processing (SURVEY.md §2.5 stateful-ops row):
    * per-user running totals via flatMapGroupsWithState — the custom-state
    * escape hatch when windowed aggs can't express the semantics. State is
    * one small record per key; with a real stream a timeout would expire
    * idle users to bound it.
    */
  final case class UserTotal(userId: Long, events: Long, total: Double)

  def runningTotals(events: org.apache.spark.sql.Dataset[UserEvent])
      : org.apache.spark.sql.Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserTotal, UserTotal](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[UserEvent], state: GroupState[UserTotal]) =>
          val prev = state.getOption.getOrElse(UserTotal(uid, 0L, 0.0))
          var n = prev.events; var t = prev.total
          batch.foreach { e => n += 1; t += e.value }
          val next = UserTotal(uid, n, t)
          state.update(next)
          Iterator.single(next)
      }
  }

  final case class UserEvent(user_id: Long, value: Double)

  /** Exact-integer form of [[runningTotals]] for cross-engine checks:
    * values arrive pre-scaled to integer cents, so the accumulated total
    * is identical under ANY micro-batch split (long addition is
    * associative; the double form can drift a ulp when the batch
    * boundaries change).
    *
    * Ported (r11) to `transformWithState` — Spark 4's supported
    * arbitrary-state surface (flatMapGroupsWithState is deprecated;
    * [[runningTotals]] above deliberately stays on it as the
    * legacy-surface exemplar). Same state machine: one small
    * ValueState record per user, Update-mode emission. The new API
    * requires the RocksDB state store provider
    * ([[withRocksDbStateStore]] scopes it to the query start) — the
    * production-correct store anyway: per-key point updates against
    * 100 TB-scale key spaces need an LSM, not the default
    * whole-map-in-memory HDFS snapshot provider.
    */
  final case class UserCents(user_id: Long, cents: Long)
  final case class UserCentsTotal(user_id: Long, n_events: Long, total_cents: Long)

  /** per-user running-cents processor: ValueState[(n, total)] updated
    * per input row, next total emitted per (key, batch-with-data) */
  final class RunningCentsProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, UserCents, UserCentsTotal] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var totals: ValueState[UserCentsTotal] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[UserCentsTotal]("totals",
        org.apache.spark.sql.Encoders.product[UserCentsTotal], TTLConfig.NONE)

    override def handleInputRows(uid: Long, rows: Iterator[UserCents],
        timers: TimerValues): Iterator[UserCentsTotal] = {
      val prev = if (totals.exists()) totals.get() else UserCentsTotal(uid, 0L, 0L)
      var n = prev.n_events; var t = prev.total_cents
      rows.foreach { e => n += 1; t += e.cents }
      val next = UserCentsTotal(uid, n, t)
      totals.update(next)
      Iterator.single(next)
    }
  }

  def runningCents(events: Dataset[UserCents]): Dataset[UserCentsTotal] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events.groupByKey(_.user_id)
      .transformWithState(new RunningCentsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** `transformWithState` refuses to run on the default HDFS-backed
    * state store; scope the RocksDB provider to a query's START (the
    * provider is pinned into the checkpoint at start, so the conf can
    * be restored immediately after).
    *
    * The providerClass key is SESSION-global (there is no per-query
    * spelling: `writeStream.option` does not reach SQLConf, and the
    * provider is resolved from the session conf when the query
    * starts), so the set→start→restore window is serialized under a
    * JVM-wide lock — a query started concurrently from another thread
    * of the same session can no longer observe (or lose) the
    * temporary RocksDB provider mid-window. The lock covers only
    * query START (the body should start the query and return, not
    * await termination); once started, a query's provider is pinned
    * into its checkpoint and the conf no longer matters to it. */
  def withRocksDbStateStore[A](s: org.apache.spark.sql.SparkSession)(body: => A): A =
    providerLock.synchronized {
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = s.conf.getOption(key)
      s.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try body
      finally prev match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
    }

  private val providerLock = new Object

  /** Streaming exact dedup (the continuous form of `doc_exact_dedup`,
    * and the ingestion-side guard a training-data pipeline runs before
    * anything else): `dropDuplicatesWithinWatermark` keeps one row per
    * key among duplicates arriving within the watermark delay, and —
    * unlike plain streaming `dropDuplicates`, whose key state grows
    * FOREVER — evicts a key's state once the watermark passes it, so
    * state is bounded by the delay window regardless of stream length.
    * The contract at 100 TB/day: duplicates separated farther than the
    * delay are not caught here (route them to the batch MinHash/exact
    * passes); state stays O(keys per window).
    */
  def dedupStream(rows: DataFrame, keyCol: String,
      delay: String = "1 hour"): DataFrame =
    rows
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark(keyCol)
}
