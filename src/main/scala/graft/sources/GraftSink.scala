package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.graftbridge.StreamingBridge
import graft.lake.{LakeTable, Watermark}

/** `df.writeStream.format("graft")` — continuous upsert ingest into a
  * lake table (the streaming form of the reference's daily-batch upsert
  * loop, glue/NYTaxiDataPrep.py:25-27; same role as Hudi's streaming
  * sink / Delta's DeltaSink).
  *
  * Exactly-once: Structured Streaming replays the last micro-batch
  * after a restart, so the sink records the highest applied batch id
  * and skips ids at or below it. The watermark is scoped PER STREAMING
  * QUERY (the checkpoint's stable query id, read from the execution's
  * local property — the same scoping Delta's txnVersion uses): batch
  * ids restart at 0 for every new checkpoint, so a table-global
  * watermark would silently discard the first batches of any later
  * pipeline writing to the same table. The marker is written AFTER the
  * upsert commit publishes; a crash between the two re-applies one
  * batch, which the precombine merge makes a no-op (same rows, same
  * precombine ⇒ same snapshot) — the standard idempotent-sink
  * contract.
  *
  * At scale each micro-batch inherits upsert's metadata-pruned rewrite:
  * it shuffles only its own keys and rewrites only touched partitions.
  */
final class GraftSink(table: LakeTable, hadoopConf: Configuration)
    extends Sink {

  // StreamExecution publishes the checkpoint-stable query id as a local
  // property for every action it runs (including addBatch)
  private def queryId: String = {
    val id = table.spark.sparkContext.getLocalProperty("sql.streaming.queryId")
    if (id == null || id.isEmpty) "default" else id
  }

  private def mark = new Watermark(
    new Path(table.config.root, "_log"), s"sink-$queryId-", hadoopConf)

  override def addBatch(batchId: Long, data: Dataset[Row]): Unit = {
    val m = mark
    if (m.last.exists(_ >= batchId)) return // restart replay — done
    table.upsert(StreamingBridge.detach(data))
    m.record(batchId)
  }

  override def toString: String = s"GraftSink[${table.config.root}]"
}
