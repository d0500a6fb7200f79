package graft.sql

import java.util.OptionalLong

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, Statistics, SupportsReportPartitioning, SupportsReportStatistics, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
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
  with SupportsReportStatistics with SupportsRuntimeV2Filtering
  with SupportsReportPartitioning {

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
    // only columns in THIS scan's (pruned) output: Spark resolves these
    // against the scan relation and fails loud on an absent column
    val out = required.fieldNames.toSet
    (table.lake.config.partitionCols ++ table.lake.config.statsCols ++ keyAttr)
      .distinct.filter(out.contains).map(Expressions.column).toArray
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

  // ---- storage-partitioned joins (key-grouped partitioning) -----------

  /** (file path → typed partition key, original distinct keys) when the
    * snapshot's directory tuples parse back exactly
    * ([[graft.lake.LakeTable.partitionKeyRows]]). Computed ONCE over the
    * static file set: runtime filters only remove files, and the
    * original key set must survive them (pruned keys plan as EMPTY
    * groups) so the reported partitioning stays truthful. */
  private lazy val keyedPlan: Option[(Map[String, InternalRow], Seq[InternalRow])] =
    table.lake.partitionKeyRows(initialFiles, table.pinned).map { keys =>
      val byPath = initialFiles.map(_.path).zip(keys).toMap
      val distinct = scala.collection.mutable.LinkedHashSet.empty[InternalRow]
      keys.foreach(distinct += _)
      (byPath, distinct.toSeq)
    }

  /** Identity-transform key-grouped partitioning over the user
    * partition columns: two lake tables co-partitioned on the join key
    * plan a storage-partitioned join — NO shuffle on either side (with
    * spark.sql.sources.v2.bucketing.enabled), and a groupBy on the
    * partition columns aggregates shuffle-free. Reported only when
    * every directory tuple provably maps back to its typed value. */
  override def outputPartitioning(): Partitioning = keyedPlan match {
    case Some((_, allKeys)) =>
      new KeyGroupedPartitioning(
        table.lake.config.partitionCols
          .map(c => Expressions.identity(c): org.apache.spark.sql.connector.expressions.Expression)
          .toArray,
        allKeys.size)
    case None => new UnknownPartitioning(0)
  }

  // ---- partition planning & reading -----------------------------------

  private def splitsOf(fs: Seq[FileAdd], maxSplit: Long): Seq[PartitionedFile] =
    fs.flatMap { f =>
      (0L until f.bytes by maxSplit).map { offset =>
        PartitionedFile(InternalRow.empty, SparkPath.fromPathString(f.path),
          offset, math.min(maxSplit, f.bytes - offset),
          Array.empty[String], 0L, f.bytes)
      }
    }.sortBy(-_.length)

  override def planInputPartitions(): Array[InputPartition] = {
    val fs = files
    val maxSplit = FilePartition.maxSplitBytes(spark, fs.map(_.bytes).sum)
    keyedPlan match {
      case None =>
        // parquet is splittable at row-group granularity: slice large
        // files so one straggler cannot serialize a stage (the
        // FileSourceScan packing discipline: largest-first, bin-packed)
        FilePartition.getFilePartitions(spark, splitsOf(fs, maxSplit), maxSplit)
          .toArray
      case Some((keyOfPath, allKeys)) =>
        // one group of keyed partitions per ORIGINAL key — a key whose
        // files a runtime filter pruned still plans (as an empty group),
        // so the key-grouped partitioning the join was planned on is
        // preserved while the pruned partitions read zero bytes
        val byKey = fs.groupBy(f => keyOfPath(f.path))
        var idx = -1
        allKeys.flatMap { k =>
          byKey.get(k) match {
            case Some(group) =>
              FilePartition.getFilePartitions(
                  spark, splitsOf(group, maxSplit), maxSplit)
                .map { fp => idx += 1
                  GraftKeyedPartition(FilePartition(idx, fp.files), k) }
            case None =>
              idx += 1
              Seq(GraftKeyedPartition(
                FilePartition(idx, Array.empty[PartitionedFile]), k))
          }
        }.toArray
    }
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
    // only filters whose columns are IN the read schema reach the
    // parquet reader: a filter on an unprojected column makes parquet's
    // column-index page filtering compute empty row ranges (measured:
    // zero rows from a file whose every row matches). The commit-log
    // file pruning already consumed those filters at the file level;
    // losing their row-group skipping is a cost, never a wrong answer.
    pushedFilters = {
      val out = required.fieldNames.toSet
      pushed.filter(_.references.forall(out.contains))
    },
    options = org.apache.spark.sql.util.CaseInsensitiveStringMap.empty(),
    pushedAggregate = None,
    partitionFilters = Seq.empty,
    dataFilters = Seq.empty)

  override def createReaderFactory(): PartitionReaderFactory =
    if (keyedPlan.isDefined)
      new GraftKeyedReaderFactory(delegate.createReaderFactory())
    else delegate.createReaderFactory()
}

/** A file-split partition tagged with its typed partition-key row —
  * the [[HasPartitionKey]] contract key-grouped (storage-partitioned)
  * planning requires of every input partition. */
private[graft] final case class GraftKeyedPartition(
    fp: FilePartition, key: InternalRow)
  extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = key
  override def preferredLocations(): Array[String] = fp.preferredLocations()
}

/** Unwraps [[GraftKeyedPartition]] before handing the split to the
  * parquet reader factory (which pattern-matches on [[FilePartition]]). */
private final class GraftKeyedReaderFactory(inner: PartitionReaderFactory)
  extends PartitionReaderFactory {
  private def unwrap(p: InputPartition): InputPartition = p match {
    case k: GraftKeyedPartition => k.fp
    case other => other
  }
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    inner.createReader(unwrap(p))
  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    inner.createColumnarReader(unwrap(p))
  override def supportColumnarReads(p: InputPartition): Boolean =
    inner.supportColumnarReads(unwrap(p))
}
