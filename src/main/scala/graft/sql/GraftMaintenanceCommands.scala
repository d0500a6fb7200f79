package graft.sql

import org.apache.spark.sql.{AnalysisException, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{LongType, StringType}

/** ANSI-flavored maintenance statements (the Delta spellings), parsed by
  * [[GraftSqlParser]]'s fallback mini-parser — Spark's grammar has no
  * OPTIMIZE/VACUUM, so these only engage after the delegate parser
  * rejected the text, and only for graft-resolvable identifiers.
  *
  * `OPTIMIZE t [WHERE p] [ZORDER BY (c, ...)]` — physical reorganization
  * with Delta's dispatch:
  *   - MoR: fold pending deltas into base files ([[graft.lake.LakeTable.compact]];
  *     the WHERE scope is the clustering rewrite's, so it requires
  *     clusterCols);
  *   - CoW with clusterCols: rewrite into cluster order
  *     ([[graft.lake.LakeTable.recluster]]), optionally pruned by the
  *     WHERE predicate — incremental 100 TB operation;
  *   - ZORDER BY must name exactly the table's configured clusterCols:
  *     clustering is a declared layout here (per-commit writes honor it),
  *     not a per-statement choice — a mismatch fails loudly with the
  *     ALTER that would change the declaration.
  *
  * `VACUUM t [RETAIN n HOURS]` — storage reclamation (default 168 h,
  * Delta's default): retire snapshots older than the window
  * ([[graft.lake.LakeTable.cleanOlderThan]] — time travel above the
  * horizon keeps working) and delete crash-orphaned directories older
  * than it ([[graft.lake.LakeTable.vacuumOrphans]]).
  */
private[sql] final case class GraftOptimizeCommand(
    catName: String, ns: Seq[String], name: String,
    whereSql: Option[String], zorderCols: Seq[String])
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("operation", StringType, nullable = false)(),
    AttributeReference("commit", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val cat = ViewResolution.graftCatalog(session, catName).getOrElse(
      throw new IllegalArgumentException(s"catalog $catName is not a graft catalog"))
    val root = cat.tableRoot(ns, name)
    val desc = graft.lake.TableDescriptor.load(root,
      session.sparkContext.hadoopConfiguration).getOrElse(
      throw new AnalysisException("TABLE_OR_VIEW_NOT_FOUND", Map(
        "relationName" -> s"`$catName`.`${(ns :+ name).mkString("`.`")}`")))
    val t = graft.lake.LakeTable(session, desc.config(root))
    val resolver = session.sessionState.conf.resolver
    if (zorderCols.nonEmpty) {
      val declared = t.config.clusterCols
      val matches = zorderCols.length == declared.length &&
        zorderCols.zip(declared).forall { case (a, b) => resolver(a, b) }
      if (!matches) throw new UnsupportedOperationException(
        s"ZORDER BY (${zorderCols.mkString(", ")}) must name the table's " +
          s"declared clusterCols (${declared.mkString(", ")}) — clustering " +
          "is a table-level layout here (writes honor it per commit); " +
          "change it with ALTER TABLE ... SET TBLPROPERTIES " +
          "('clusterCols'='...')")
    }
    val pruneBy = whereSql.map(w =>
      org.apache.spark.sql.functions.expr(w))
    val (op, cid) =
      if (t.config.clusterCols.nonEmpty) ("recluster", t.recluster(pruneBy))
      else if (t.config.isMor) {
        require(whereSql.isEmpty,
          "OPTIMIZE ... WHERE needs clusterCols (the scope is the " +
            "clustering rewrite's); plain OPTIMIZE compacts the whole table")
        ("compact", t.compact())
      } else {
        // Delta's core OPTIMIZE use: bin-pack a CoW table's accumulated
        // small files (one per small commit) into target-sized ones
        require(whereSql.isEmpty,
          "OPTIMIZE ... WHERE needs clusterCols (the scope is the " +
            "clustering rewrite's); plain OPTIMIZE bin-packs small files")
        ("compact_small", t.compactSmall())
      }
    Seq(Row(op, cid))
  }
}

/** `RESTORE TABLE t TO VERSION AS OF n` — the Delta spelling of
  * `CALL graft.system.restore`: roll the timeline back to commit `n`
  * (later commits retire; time travel ABOVE the restore point keeps
  * working until cleaned). */
private[sql] final case class GraftRestoreCommand(
    catName: String, ns: Seq[String], name: String, version: Long)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("restored_to", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val cat = ViewResolution.graftCatalog(session, catName).getOrElse(
      throw new IllegalArgumentException(s"catalog $catName is not a graft catalog"))
    val root = cat.tableRoot(ns, name)
    val desc = graft.lake.TableDescriptor.load(root,
      session.sparkContext.hadoopConfiguration).getOrElse(
      throw new AnalysisException("TABLE_OR_VIEW_NOT_FOUND", Map(
        "relationName" -> s"`$catName`.`${(ns :+ name).mkString("`.`")}`")))
    val t = graft.lake.LakeTable(session, desc.config(root))
    t.restoreTo(version)
    Seq(Row(version))
  }
}

private[sql] final case class GraftVacuumCommand(
    catName: String, ns: Seq[String], name: String, retainHours: Option[Long])
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("cleaned_up_to", LongType, nullable = false)(),
    AttributeReference("orphans_removed", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val cat = ViewResolution.graftCatalog(session, catName).getOrElse(
      throw new IllegalArgumentException(s"catalog $catName is not a graft catalog"))
    val root = cat.tableRoot(ns, name)
    val desc = graft.lake.TableDescriptor.load(root,
      session.sparkContext.hadoopConfiguration).getOrElse(
      throw new AnalysisException("TABLE_OR_VIEW_NOT_FOUND", Map(
        "relationName" -> s"`$catName`.`${(ns :+ name).mkString("`.`")}`")))
    val t = graft.lake.LakeTable(session, desc.config(root))
    val ms = retainHours.getOrElse(168L) * 3600L * 1000L
    t.cleanOlderThan(ms)
    val orphans = t.vacuumOrphans(ms)
    Seq(Row(t.log.cleanedUpTo, orphans.size.toLong))
  }
}
