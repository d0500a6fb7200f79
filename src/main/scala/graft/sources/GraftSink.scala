package graft.sources

import java.nio.charset.StandardCharsets

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

  private val marker = new Path(table.config.root, "_log/sink-batch")
  private def fs = marker.getFileSystem(hadoopConf)

  private def lastApplied: Option[Long] =
    if (!fs.exists(marker)) None
    else {
      val in = fs.open(marker)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong)
      finally in.close()
    }

  private def record(batchId: Long): Unit = {
    // temp + rename: the marker appears atomically, same discipline as
    // the commit JSON itself
    val tmp = new Path(marker.getParent, s"${marker.getName}.tmp")
    val out = fs.create(tmp, true)
    try out.write(batchId.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    fs.rename(tmp, marker)
  }

  override def addBatch(batchId: Long, data: Dataset[Row]): Unit = {
    if (lastApplied.exists(_ >= batchId)) return // restart replay — done
    table.upsert(StreamingBridge.detach(data))
    record(batchId)
  }

  override def toString: String = s"GraftSink[${table.config.root}]"
}
