package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.catalog.CatalogTable
import org.apache.spark.sql.connector.catalog.V2TableWithV1Fallback

/** [[V2TableWithV1Fallback]] is `private[sql]` but it IS the supported
  * integration shape for V1-source streaming through a DSv2 catalog
  * table — the analyzer's `RelationResolution` and
  * `DataStreamWriter.toTable` both consult it (Delta rode this exact
  * trait for `readStream.table`/`toTable` for years). This shim
  * re-exports it as a public trait so the graft catalog table can mix
  * it in from outside the spark.sql package tree.
  */
trait V1FallbackBridge extends V2TableWithV1Fallback {
  /** the V1 `CatalogTable` handed to the streaming source/sink: its
    * provider + location + storage properties drive the fallback */
  def v1FallbackTable: CatalogTable
  override def v1Table: CatalogTable = v1FallbackTable
}
