package graft.sources


import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.graftbridge.StreamingBridge
import graft.lake.LakeTable

/** `df.writeStream.format("graft")` — continuous upsert ingest into a
  * lake table (the streaming form of the reference's daily-batch upsert
  * loop, glue/NYTaxiDataPrep.py:25-27; same role as Hudi's streaming
  * sink / Delta's DeltaSink).
  *
  * Exactly-once: Structured Streaming replays the last micro-batch after
  * a restart, so the sink persists the highest applied batch id in a
  * marker under the table's log dir and skips batch ids at or below it.
  * The marker is written AFTER the upsert commit publishes; a crash
  * between the two re-applies one batch, which the precombine merge
  * makes a no-op (same rows, same precombine ⇒ same snapshot) — the
  * standard idempotent-sink contract. One streaming writer per table,
  * like every other write path (single-writer commit log).
  *
  * At scale each micro-batch inherits upsert's metadata-pruned rewrite:
  * it shuffles only its own keys and rewrites only touched partitions.
  */
final class GraftSink(table: LakeTable, hadoopConf: Configuration)
    extends Sink {

  // one EMPTY marker file per applied batch id, atomically created under
  // its own name (the CommitLog pattern). A rename onto an existing
  // marker path would FAIL on Hadoop filesystems and freeze the
  // watermark — upsert idempotency would mask the re-application, but
  // the exactly-once contract would be silently weakened.
  private val markerDir = new Path(table.config.root, "_log")
  private def fs = markerDir.getFileSystem(hadoopConf)

  private def lastApplied: Option[Long] =
    if (!fs.exists(markerDir)) None
    else fs.listStatus(markerDir).toSeq
      .map(_.getPath.getName)
      .filter(_.matches("sink-batch-\\d{8,}"))
      .map(_.stripPrefix("sink-batch-").toLong)
      .maxOption

  private def record(batchId: Long): Unit = {
    fs.mkdirs(markerDir)
    fs.create(new Path(markerDir, f"sink-batch-$batchId%08d"), true).close()
    lastApplied.foreach { latest =>
      fs.listStatus(markerDir).toSeq.map(_.getPath)
        .filter(p => p.getName.matches("sink-batch-\\d{8,}") &&
          p.getName.stripPrefix("sink-batch-").toLong < latest)
        .foreach(p => try fs.delete(p, false) catch { case _: Exception => () })
    }
  }

  override def addBatch(batchId: Long, data: Dataset[Row]): Unit = {
    if (lastApplied.exists(_ >= batchId)) return // restart replay — done
    table.upsert(StreamingBridge.detach(data))
    record(batchId)
  }

  override def toString: String = s"GraftSink[${table.config.root}]"
}
