package graft.sql

import java.util.OptionalLong

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, Statistics, SupportsReportStatistics, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.execution.datasources.{FilePartition, InMemoryFileIndex, PartitionedFile}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.graftbridge.PredicateBridge
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

import graft.lake.FileAdd
import graft.sources.FilterTranslation

/** Native DSv2 batch scan for lake snapshots the strict prover
  * certifies as a bare parquet union ([[graft.lake.LakeTable.nativeScanFiles]]:
  * all-base files, no schema-evolution adaptation, recorded lengths).
  * Everything else — MoR merge, evolved schemas — keeps the V1 fallback
  * path untouched, the same certify-completely-or-fall-through contract
  * as the metadata aggregate pushdown.
  *
  * What the native path buys at 100 TB over the V1 fallback (which
  * compiles an inner DataFrame to an RDD[Row] — paying an
  * InternalRow→Row→InternalRow double conversion per row and fencing
  * whole-stage codegen at the scan boundary):
  *
  *   - **columnar vectorized reads straight into the consuming stage**
  *     (the [[ParquetScan]] delegate's reader factory, with parquet
  *     row-group/page skipping from the pushed filters);
  *   - **exact planner statistics** ([[SupportsReportStatistics]]): the
  *     commit log's per-file bytes/rows, summed AFTER static pruning —
  *     a dimension scan pruned to one partition now auto-broadcasts;
  *   - **runtime file pruning** ([[SupportsRuntimeV2Filtering]], the
  *     dynamic-partition-pruning surface): join-key values collected at
  *     execution prune the FILE LIST through the same metadata channels
  *     as static pushdown — partition tuples, column stats ranges, and
  *     the record-key range/bloom index. A fact-dim join whose dim
  *     filter survives on 3 of 1000 partitions reads 3 partitions.
  *
  * Row-level correctness never depends on any of this: all pushed and
  * runtime predicates remain PRUNING hints (Spark re-applies every
  * filter above the scan; the runtime predicate is redundant with the
  * join it came from).
  */
final class GraftBatchScan(
    spark: SparkSession,
    table: GraftTableV2,
    required: StructType,
    pushed: Array[Filter],
    physicalSchema: StructType,
    initialFiles: Seq[FileAdd])
  extends Scan with Batch
  with SupportsReportStatistics with SupportsRuntimeV2Filtering {

  @volatile private var files: Seq[FileAdd] = initialFiles

  /** observability for specs: file count after the last runtime
    * filter() call (-1 = no runtime filter delivered) */
  @volatile private[graft] var runtimePrunedTo: Int = -1

  /** observability for specs: current planned file count */
  private[graft] def currentFiles: Int = files.size

  override def readSchema(): StructType = required

  override def toBatch: Batch = this

  override def description(): String =
    s"graft native scan ${table.name()} " +
      s"[files=${files.size}, pushed=${pushed.mkString(", ")}]"

  // ---- statistics (planner broadcast/reorder decisions) ---------------

  override def estimateStatistics(): Statistics = {
    val fs = files
    new Statistics {
      // commit-log exact bytes of the PRUNED file list (never 0: a
      // zero estimate would make an empty-pruned scan look free to
      // duplicate; 1 byte keeps it broadcastable without lying)
      override def sizeInBytes(): OptionalLong =
        OptionalLong.of(math.max(fs.map(_.bytes).sum, 1L))
      override def numRows(): OptionalLong =
        if (fs.nonEmpty && fs.forall(_.rows > 0L))
          OptionalLong.of(fs.map(_.rows).sum)
        else OptionalLong.empty()
    }
  }

  // ---- runtime (dynamic partition pruning) filtering -------------------

  /** Join keys on these columns are eligible for runtime pruning: the
    * metadata can translate each into file skipping (partition tuples /
    * stats ranges / key range+bloom). */
  override def filterAttributes(): Array[NamedReference] = {
    val keyAttr =
      if (table.lake.config.keyCols.size == 1) table.lake.config.keyCols
      else Seq.empty
    (table.lake.config.partitionCols ++ table.lake.config.statsCols ++ keyAttr)
      .distinct.map(Expressions.column).toArray
  }

  override def filter(predicates: Array[Predicate]): Unit = {
    val cols = predicates.toSeq
      .flatMap(PredicateBridge.toV1)
      .flatMap(FilterTranslation.toColumn(_))
    cols.reduceOption(_ && _).foreach { cond =>
      table.lake.resolvePredicate(cond, table.pinned).foreach { p =>
        files = table.lake.pruneFilesFor(files, p, table.pinned)
      }
    }
    runtimePrunedTo = files.size
  }

  // ---- partition planning & reading -----------------------------------

  override def planInputPartitions(): Array[InputPartition] = {
    val fs = files
    val maxSplit = FilePartition.maxSplitBytes(spark, fs.map(_.bytes).sum)
    // parquet is splittable at row-group granularity: slice large files
    // so one straggler file cannot serialize a stage (the FileSourceScan
    // packing discipline: largest-first, bin-packed to maxSplit)
    val splits = fs.flatMap { f =>
      (0L until f.bytes by maxSplit).map { offset =>
        PartitionedFile(InternalRow.empty, SparkPath.fromPathString(f.path),
          offset, math.min(maxSplit, f.bytes - offset),
          Array.empty[String], 0L, f.bytes)
      }
    }.sortBy(-_.length)
    FilePartition.getFilePartitions(spark, splits, maxSplit).toArray
  }

  /** The reader factory comes from a real [[ParquetScan]] delegate so
    * every hadoopConf key the parquet readers expect (read-support
    * class, schema strings, session timezone, rebase modes, …) is set
    * by Spark's own code, not replicated here. The delegate's file
    * index is an empty placeholder — createReaderFactory never consults
    * it; THIS scan plans the partitions from the commit log. */
  private lazy val delegate: ParquetScan = ParquetScan(
    spark,
    spark.sessionState.newHadoopConf(),
    new InMemoryFileIndex(spark, Nil, Map.empty, Some(physicalSchema)),
    dataSchema = physicalSchema,
    readDataSchema = required,
    readPartitionSchema = new StructType(),
    pushedFilters = pushed,
    options = org.apache.spark.sql.util.CaseInsensitiveStringMap.empty(),
    pushedAggregate = None,
    partitionFilters = Seq.empty,
    dataFilters = Seq.empty)

  override def createReaderFactory(): PartitionReaderFactory =
    delegate.createReaderFactory()
}
