package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.classic.{Dataset => CDataset}
import org.apache.spark.sql.execution.LogicalRDD

/** A micro-batch frame handed to `Sink.addBatch` is planned by the
  * streaming IncrementalExecution; running NEW actions on it (as a
  * multi-pass writer like LakeTable.upsert must) trips the
  * streaming-source analysis guard. The engine's own escape hatch —
  * what ForeachBatchSink does before invoking user code — is to re-root
  * the already-planned RDD as a batch LogicalRDD. That constructor is
  * private[sql]; this shim re-exports exactly that one conversion.
  */
object StreamingBridge {
  def detach(df: Dataset[Row]): DataFrame = {
    val cdf = df.asInstanceOf[CDataset[Row]]
    val node = LogicalRDD.fromDataset(
      cdf.queryExecution.toRdd, cdf, isStreaming = false)
    CDataset.ofRows(cdf.sparkSession, node)
  }

  /** The inverse direction, for a custom streaming Source: `getBatch`
    * must return a frame marked `isStreaming = true` or the streaming
    * planner rejects it. This is what the built-in FileStreamSource does
    * (`internalCreateDataFrame(df.queryExecution.toRdd, schema,
    * isStreaming = true)`) — re-rooted here through the same private[sql]
    * LogicalRDD constructor. */
  def asStream(df: Dataset[Row]): DataFrame = {
    val cdf = df.asInstanceOf[CDataset[Row]]
    val node = LogicalRDD.fromDataset(
      cdf.queryExecution.toRdd, cdf, isStreaming = true)
    CDataset.ofRows(cdf.sparkSession, node)
  }
}
