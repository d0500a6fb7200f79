package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedIdentifier, UnresolvedNamespace, UnresolvedTableOrView, UnresolvedView}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.types.{DataType, StructType}

/** Parser hook carrying view DDL on graft catalogs. Spark 4.1 parses
  * `CREATE/DROP/ALTER VIEW` and `SHOW VIEWS` into v2 logical plans but
  * its ResolveSessionCatalog analyzer rule unconditionally throws
  * MISSING_CATALOG_ABILITY for any non-session catalog BEFORE injected
  * resolution rules run (verified against the 4.1.2 bytecode: the
  * CreateView case has no ViewCatalog branch) — so the interception has
  * to happen at parse time, the integration point Iceberg's view support
  * used for the same reason. Statements whose identifier does not
  * resolve to a [[GraftCatalog]] pass through byte-identical.
  *
  * Everything except `parsePlan` delegates untouched; `parsePlan`
  * delegates and then pattern-rewrites exactly four node types, so the
  * per-statement overhead for non-view SQL is one instanceof chain.
  */
final class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  private def session = SparkSession.active

  override def parsePlan(sqlText: String): LogicalPlan =
    try rewrite(delegate.parsePlan(sqlText))
    catch {
      case e: org.apache.spark.sql.catalyst.parser.ParseException =>
        // OPTIMIZE / VACUUM have no Spark grammar: the mini-parser only
        // engages AFTER the delegate rejected the text, and only when
        // the identifier resolves to a graft catalog — everything else
        // rethrows the ORIGINAL error so ordinary syntax errors stay
        // Spark's own
        parseMaintenance(sqlText).getOrElse(throw e)
    }

  private val OptimizeRe =
    ("(?is)^\\s*OPTIMIZE\\s+([\\w.`]+)" +
      "(?:\\s+WHERE\\s+(.+?))?" +
      "(?:\\s+ZORDER\\s+BY\\s*\\(([^)]*)\\))?\\s*;?\\s*$").r
  private val VacuumRe =
    ("(?is)^\\s*VACUUM\\s+([\\w.`]+)(?:\\s+RETAIN\\s+(\\d+)\\s+HOURS?)?" +
      "(\\s+DRY\\s+RUN)?\\s*;?\\s*$").r
  private val RestoreRe =
    "(?is)^\\s*RESTORE\\s+(?:TABLE\\s+)?([\\w.`]+)\\s+TO\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)\\s*;?\\s*$".r
  private val RestoreTsRe =
    ("(?is)^\\s*RESTORE\\s+(?:TABLE\\s+)?([\\w.`]+)\\s+TO\\s+TIMESTAMP" +
      "\\s+AS\\s+OF\\s+'([^']+)'\\s*;?\\s*$").r
  // multi-table transactions (lake/Txn.scala) — Spark's grammar has no
  // BEGIN/COMMIT/ROLLBACK statements (all ParseException), so the
  // fallback owns the spellings; session-scoped, see GraftTxnCommands
  private val BeginRe =
    "(?is)^\\s*BEGIN(?:\\s+TRANSACTION|\\s+TRAN|\\s+WORK)?\\s*;?\\s*$".r
  private val CommitRe =
    "(?is)^\\s*COMMIT(?:\\s+TRANSACTION|\\s+TRAN|\\s+WORK)?\\s*;?\\s*$".r
  private val RollbackRe =
    "(?is)^\\s*ROLLBACK(?:\\s+TRANSACTION|\\s+TRAN|\\s+WORK)?\\s*;?\\s*$".r
  // savepoints (partial rollback inside the open session transaction)
  private val SavepointRe =
    "(?is)^\\s*SAVEPOINT\\s+([A-Za-z_]\\w*)\\s*;?\\s*$".r
  private val RollbackToRe =
    "(?is)^\\s*ROLLBACK\\s+TO\\s+(?:SAVEPOINT\\s+)?([A-Za-z_]\\w*)\\s*;?\\s*$".r
  private val ReleaseRe =
    "(?is)^\\s*RELEASE\\s+(?:SAVEPOINT\\s+)?([A-Za-z_]\\w*)\\s*;?\\s*$".r

  private val CopyRe =
    ("(?is)^\\s*COPY\\s+INTO\\s+([\\w.`]+)\\s+FROM\\s+'([^']+)'" +
      "(?:\\s+FILEFORMAT\\s*=\\s*(\\w+))?" +
      "(?:\\s+FILES\\s*=\\s*\\(([^)]*)\\))?" +
      "(?:\\s+PATTERN\\s*=\\s*'([^']+)')?" +
      "(?:\\s+FORMAT_OPTIONS\\s*\\(([^)]*)\\))?\\s*;?\\s*$").r
  /** `'key' = 'value'` pairs inside FORMAT_OPTIONS(...) */
  private val CopyOptRe = "'([^']+)'\\s*=\\s*'([^']*)'".r

  private val CloneRe =
    ("(?is)^\\s*CREATE\\s+TABLE\\s+(IF\\s+NOT\\s+EXISTS\\s+)?([\\w.`]+)" +
      "\\s+(SHALLOW|DEEP)\\s+CLONE\\s+([\\w.`]+)" +
      "(?:\\s+VERSION\\s+AS\\s+OF\\s+(\\d+))?\\s*;?\\s*$").r

  private def parseMaintenance(sql: String): Option[LogicalPlan] = sql match {
    case CloneRe(ine, dst, kind, src, ver) =>
      val dstParts = delegate.parseMultipartIdentifier(dst)
      val srcParts = delegate.parseMultipartIdentifier(src)
      ViewResolution.resolve(session, dstParts).map { case (cat, ns, name) =>
        GraftCloneCommand(cat.name, ns, name, srcParts,
          Option(ver).map(_.toLong), ifNotExists = ine != null,
          deep = kind.equalsIgnoreCase("deep"))
      }
    case CopyRe(ident, src, fmt, files, pat, opts) =>
      val parts = delegate.parseMultipartIdentifier(ident)
      val options = Option(opts).map(o =>
        CopyOptRe.findAllMatchIn(o)
          .map(m => m.group(1) -> m.group(2)).toMap).getOrElse(Map.empty)
      val fileList = Option(files).map(f =>
        "'([^']+)'".r.findAllMatchIn(f).map(_.group(1)).toSeq)
        .getOrElse(Seq.empty)
      require(fileList.isEmpty || pat == null,
        "COPY INTO accepts FILES or PATTERN, not both")
      ViewResolution.resolve(session, parts).map { case (cat, ns, name) =>
        GraftCopyIntoCommand(cat.name, ns, name, src,
          Option(fmt).getOrElse("parquet"), Option(pat), options, fileList)
      }
    case BeginRe() => Some(GraftBeginTxnCommand())
    case CommitRe() => Some(GraftCommitTxnCommand())
    case RollbackRe() => Some(GraftRollbackTxnCommand())
    case SavepointRe(name) => Some(GraftSavepointCommand(name))
    case RollbackToRe(name) => Some(GraftRollbackToSavepointCommand(name))
    case ReleaseRe(name) => Some(GraftReleaseSavepointCommand(name))
    case RestoreRe(ident, version) =>
      val parts = delegate.parseMultipartIdentifier(ident)
      ViewResolution.resolve(session, parts).map { case (cat, ns, name) =>
        GraftRestoreCommand(cat.name, ns, name, Some(version.toLong))
      }
    case RestoreTsRe(ident, ts) =>
      val parts = delegate.parseMultipartIdentifier(ident)
      ViewResolution.resolve(session, parts).map { case (cat, ns, name) =>
        GraftRestoreCommand(cat.name, ns, name, None, Some(ts))
      }
    case OptimizeRe(ident, where, zorder) =>
      val parts = delegate.parseMultipartIdentifier(ident)
      ViewResolution.resolve(session, parts).map { case (cat, ns, name) =>
        GraftOptimizeCommand(cat.name, ns, name,
          Option(where).map(_.trim).filter(_.nonEmpty),
          Option(zorder).toSeq.flatMap(_.split(','))
            .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty))
      }
    case VacuumRe(ident, hours, dry) =>
      val parts = delegate.parseMultipartIdentifier(ident)
      ViewResolution.resolve(session, parts).map { case (cat, ns, name) =>
        GraftVacuumCommand(cat.name, ns, name, Option(hours).map(_.toLong),
          dryRun = dry != null)
      }
    case _ => None
  }

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan match {
    case cv @ CreateView(UnresolvedIdentifier(parts, _), cols, comment,
        _, props, originalText, query, allowExisting, replace, _) =>
      ViewResolution.resolve(session, parts) match {
        case Some((cat, ns, name)) =>
          GraftCreateViewCommand(cat.name, ns, name, cols.map(_._1),
            comment, props, originalText, query, allowExisting, replace)
        case None => cv
      }
    case dv @ DropView(UnresolvedIdentifier(parts, _), ifExists) =>
      ViewResolution.resolve(session, parts) match {
        case Some((cat, ns, name)) =>
          GraftDropViewCommand(cat.name, ns, name, ifExists)
        case None => dv
      }
    case av @ AlterViewAs(UnresolvedView(parts, _, _, _), originalText, query) =>
      ViewResolution.resolve(session, parts) match {
        case Some((cat, ns, name)) =>
          GraftAlterViewAsCommand(cat.name, ns, name, Some(originalText), query)
        case None => av
      }
    case sv @ ShowViews(UnresolvedNamespace(parts, _), pattern, output) =>
      // SHOW VIEWS names a NAMESPACE, not a view: parts are the full
      // namespace. Resolve its catalog head the same way.
      val resolved = parts match {
        case head +: rest if ViewResolution.graftCatalog(session, head).isDefined =>
          Some((ViewResolution.graftCatalog(session, head).get, rest))
        // a head naming a registered NON-graft catalog addresses THAT
        // catalog — pass through, never list the graft warehouse
        case head +: _ if scala.util.Try(session.sessionState.catalogManager
            .catalog(head)).toOption.exists(!_.isInstanceOf[GraftCatalog]) =>
          None
        case _ => session.sessionState.catalogManager.currentCatalog match {
          case g: GraftCatalog =>
            Some((g, if (parts.nonEmpty) parts
              else session.sessionState.catalogManager.currentNamespace.toSeq))
          case _ => None
        }
      }
      resolved match {
        case Some((cat, ns)) => GraftShowViewsCommand(cat.name, ns, pattern, output)
        case None => sv
      }
    // DESCRIBE / SHOW CREATE / RENAME on a STORED VIEW: these parse to
    // table-or-view nodes whose analysis only knows tables on a v2
    // catalog — claim them exactly when the name resolves to a stored
    // graft view (tables pass through untouched; the existence check is
    // one fs probe and only runs for these three statement shapes)
    // `DESCRIBE DETAIL t` has no Spark grammar of its own — it parses
    // as DescribeColumn(table `detail`, column <t>). Claim that shape
    // exactly when the "column" resolves to a graft TABLE (a real
    // `DESCRIBE tbl col` never matches: its table isn't named detail)
    case dc @ DescribeColumn(UnresolvedTableOrView(Seq(d), _, _), col, _, _)
        if d.equalsIgnoreCase("detail") || d.equalsIgnoreCase("history") =>
      val parts = col match {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          a.nameParts
        case _ => Seq.empty
      }
      storedTable(parts) match {
        case Some((cat, ns, name)) if d.equalsIgnoreCase("detail") =>
          GraftDescribeDetailCommand(cat.name, ns, name)
        // `DESCRIBE HISTORY t` — the Delta spelling of the `.history`
        // metadata table / graft_history TVF, same parse shape as DETAIL
        case Some((cat, ns, name)) =>
          GraftDescribeHistoryCommand(cat.name, ns, name)
        case None => dc
      }
    case dr @ DescribeRelation(UnresolvedTableOrView(parts, _, _), _, isExtended, output) =>
      storedView(parts) match {
        case Some((cat, ns, name)) =>
          GraftDescribeViewCommand(cat.name, ns, name, isExtended, output)
        case None => dr
      }
    case sc @ ShowCreateTable(UnresolvedTableOrView(parts, _, _), _, output) =>
      storedView(parts) match {
        case Some((cat, ns, name)) =>
          GraftShowCreateViewCommand(cat.name, ns, name, output)
        case None => sc
      }
    case rt @ RenameTable(UnresolvedTableOrView(parts, _, _), newNameParts, _) =>
      storedView(parts) match {
        case Some((cat, ns, name)) =>
          GraftRenameViewCommand(cat.name, ns, name, newNameParts.last)
        case None => rt
      }
    // ANSI `ANALYZE TABLE ... COMPUTE STATISTICS [FOR COLUMNS ...]` on a
    // graft table: FOR COLUMNS runs the engine's one-pass column
    // analyze (NDV/nulls/ranges/lengths → served to CBO); the bare form
    // is a successful no-op — row and size statistics are ALWAYS exact
    // from the commit log, there is nothing to compute
    case at @ AnalyzeTable(UnresolvedTableOrView(parts, _, _), _, _) =>
      storedTable(parts) match {
        case Some((cat, ns, name)) =>
          GraftAnalyzeCommand(cat.name, ns, name, Seq.empty, columnsPass = false)
        case None => at
      }
    case ac @ AnalyzeColumn(UnresolvedTableOrView(parts, _, _), cols, _) =>
      storedTable(parts) match {
        case Some((cat, ns, name)) =>
          GraftAnalyzeCommand(cat.name, ns, name,
            cols.getOrElse(Seq.empty), columnsPass = true)
        case None => ac
      }
    case other => other
  }

  /** resolve + existence-check a graft TABLE (same never-throw contract
    * as [[storedView]]) */
  private def storedTable(parts: Seq[String])
      : Option[(GraftCatalog, Seq[String], String)] =
    scala.util.Try(ViewResolution.resolve(session, parts).filter {
      case (cat, ns, name) =>
        cat.tableExists(org.apache.spark.sql.connector.catalog.Identifier
          .of(ns.toArray, name))
    }).toOption.flatten

  /** resolve + existence-check a stored view, never throwing at parse
    * time (analysis owns the errors for non-views) */
  private def storedView(parts: Seq[String])
      : Option[(GraftCatalog, Seq[String], String)] =
    scala.util.Try(ViewResolution.resolve(session, parts).filter {
      case (cat, ns, name) => ViewStore.exists(cat.warehousePath, ns, name,
        session.sparkContext.hadoopConfiguration)
    }).toOption.flatten

  // ---- pure delegation --------------------------------------------------
  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
