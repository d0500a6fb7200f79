package graft.sql

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.lake.LakeTable

/** Read-only metadata tables resolved as a SUFFIX on a lake table's
  * identifier (the Iceberg metadata-table surface):
  *
  * {{{
  *   SELECT * FROM g.db.t.history     -- the commit timeline
  *   SELECT * FROM g.db.t.files       -- live file inventory
  *   SELECT * FROM g.db.t.partitions  -- per-partition file stats
  *   SELECT * FROM g.db.t.tags        -- named tag refs
  * }}}
  *
  * All four are COMMIT-LOG-scale: the rows are driver-local metadata
  * the log already materializes for planning (live file list, timeline,
  * tag map), never data-file reads — so they plan as a [[LocalScan]],
  * the same shape the stored procedures return results through. A real
  * table always shadows the suffix: the catalog only resolves a
  * metadata table when `db.t.<suffix>` names no stored table.
  *
  * The snapshot is pinned at RESOLUTION time (one frame per load), so a
  * query joining two metadata tables sees one consistent timeline.
  */
final class GraftMetaTable(ident: String, frame: () => DataFrame)
    extends Table with SupportsRead {

  private lazy val df: DataFrame = frame()

  override def name(): String = ident
  override def schema(): StructType = df.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new LocalScan {
        override def rows(): Array[InternalRow] =
          df.queryExecution.executedPlan.executeCollect()
        override def readSchema(): StructType = df.schema
        override def description(): String = s"graft metadata table $ident"
      }
    }
}

object GraftMetaTable {
  /** suffix → frame builder; the catalog consults the key set */
  val kinds: Map[String, LakeTable => DataFrame] = Map(
    "history" -> (_.history()),
    "files" -> (_.filesDf()),
    "partitions" -> (_.partitionsDf()),
    "tags" -> (_.tagsDf()),
    "branches" -> (_.branchesDf()))
}
