package graft.sql

import scala.util.Try

import org.apache.spark.sql.{AnalysisException, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graftbridge.PlanBridge

/** Identifier → graft-catalog resolution shared by the view DDL parser
  * hook and the read-time substitution rule. A multipart name resolves
  * to (catalog, namespace, name) when its head names a registered
  * [[GraftCatalog]], or when the SESSION's current catalog is one (bare
  * names then pick up the current namespace — the same rules Spark's
  * own ResolveCatalogs applies). Returns None for non-graft targets so
  * every other catalog's statements pass through untouched.
  */
private[sql] object ViewResolution {

  def graftCatalog(session: SparkSession, name: String): Option[GraftCatalog] =
    Try(session.sessionState.catalogManager.catalog(name)).toOption
      .collect { case g: GraftCatalog => g }

  /** resolve statement-level name parts against the session context */
  def resolve(session: SparkSession, parts: Seq[String])
      : Option[(GraftCatalog, Seq[String], String)] = {
    val cm = session.sessionState.catalogManager
    // a head that names a registered NON-graft catalog addresses THAT
    // catalog — fall through to Spark untouched rather than treating
    // ['spark_catalog','default'] as a namespace inside the current
    // graft catalog (which would hijack cross-catalog DDL)
    def isForeignCatalog(head: String): Boolean =
      Try(cm.catalog(head)).toOption.exists(!_.isInstanceOf[GraftCatalog])
    parts match {
      case head +: rest if rest.nonEmpty && graftCatalog(session, head).isDefined =>
        Some((graftCatalog(session, head).get, rest.init, rest.last))
      case head +: rest if rest.nonEmpty && isForeignCatalog(head) =>
        None
      case _ =>
        cm.currentCatalog match {
          case g: GraftCatalog =>
            val ns = if (parts.length >= 2) parts.init
              else cm.currentNamespace.toSeq
            Some((g, ns, parts.last))
          case _ => None
        }
    }
  }

  /** qualify name parts in a DEFINER's frozen context (no session state:
    * views must mean the same thing for every reader) */
  def qualify(parts: Seq[String], defCat: String, defNs: Seq[String],
      registered: String => Boolean): Seq[String] =
    parts match {
      case head +: rest if rest.nonEmpty && registered(head) => parts
      case _ if parts.length >= 2 => defCat +: parts
      case _ => (defCat +: defNs) :+ parts.last
    }
}

/** `CREATE [OR REPLACE] VIEW cat.ns.v [(col [, ...])] AS <query>` on a
  * graft catalog — rewritten at PARSE time ([[GraftSqlParser]]) because
  * Spark's ResolveSessionCatalog unconditionally rejects v2-catalog
  * views before any injected resolution rule can run. The query is
  * analyzed here only to validate it and record the output schema; the
  * stored definition is the TEXT (re-analyzed at every read, so views
  * track schema evolution of their base tables like Spark/Hive views).
  */
private[sql] final case class GraftCreateViewCommand(
    catName: String,
    ns: Seq[String],
    name: String,
    userColumns: Seq[String],
    comment: Option[String],
    properties: Map[String, String],
    originalText: Option[String],
    query: LogicalPlan,
    allowExisting: Boolean,
    replace: Boolean) extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    val cat = ViewResolution.graftCatalog(session, catName).getOrElse(
      throw new IllegalArgumentException(s"catalog $catName is not a graft catalog"))
    val hconf = session.sparkContext.hadoopConfiguration
    val wh = cat.warehousePath
    val text = originalText.getOrElse(throw new IllegalArgumentException(
      "CREATE VIEW requires the original query text"))
    val cm = session.sessionState.catalogManager
    val defCat = cm.currentCatalog.name
    val defNs = cm.currentNamespace.toSeq

    // a view must not shadow a table (and vice versa at CREATE TABLE —
    // tables win at read time because relation resolution runs first,
    // so refuse the collision at the source)
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(ns.toArray, name)
    if (cat.tableExists(ident))
      throw new AnalysisException("TABLE_OR_VIEW_ALREADY_EXISTS",
        Map("relationName" -> s"$catName.${(ns :+ name).mkString(".")}"))
    val exists = ViewStore.exists(wh, ns, name, hconf)
    if (exists && allowExisting) return Seq.empty
    if (exists && !replace)
      throw new AnalysisException("TABLE_OR_VIEW_ALREADY_EXISTS",
        Map("relationName" -> s"$catName.${(ns :+ name).mkString(".")}"))

    // direct self-reference (legal only as a read of the PREVIOUS
    // definition under REPLACE, but the stored text is the NEW one, so
    // expansion would recurse forever — reject like Postgres does).
    // Indirect cycles through other views are caught at read time by
    // the expansion seen-set.
    val self = (catName +: ns :+ name).map(_.toLowerCase)
    def refsSelf(p: LogicalPlan): Boolean = {
      var hit = false
      p.foreach {
        case UnresolvedRelation(parts, _, _) =>
          val q = ViewResolution.qualify(parts, defCat, defNs,
            n => Try(cm.catalog(n)).isSuccess)
          if (q.map(_.toLowerCase) == self) hit = true
        case _ => ()
      }
      hit
    }
    if (refsSelf(query))
      throw new AnalysisException("RECURSIVE_VIEW", Map(
        "viewIdent" -> self.mkString("."), "newPath" -> self.mkString(".")))

    // validate by analyzing in the CURRENT context (the same context we
    // persist, so read-time expansion resolves identically)
    val analyzed = PlanBridge.ofRows(session, query)
    val outCols = analyzed.schema.fields.map(_.name).toSeq
    require(userColumns.isEmpty || userColumns.length == outCols.length,
      s"CREATE VIEW column list has ${userColumns.length} names but the " +
        s"query produces ${outCols.length} columns")
    val schema =
      if (userColumns.isEmpty) analyzed.schema
      else org.apache.spark.sql.types.StructType(
        analyzed.schema.fields.zip(userColumns).map { case (f, n) => f.copy(name = n) })

    ViewStore.save(wh, ns, name, ViewDef(
      sql = text,
      columnAliases = userColumns,
      comment = comment.getOrElse(""),
      properties = properties,
      currentCatalog = defCat,
      currentNamespace = defNs,
      schemaJson = schema.json,
      createdMs = System.currentTimeMillis()), hconf)
    Seq.empty
  }
}

private[sql] final case class GraftDropViewCommand(
    catName: String, ns: Seq[String], name: String, ifExists: Boolean)
  extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val cat = ViewResolution.graftCatalog(session, catName).get
    val dropped = ViewStore.drop(cat.warehousePath, ns, name,
      session.sparkContext.hadoopConfiguration)
    if (!dropped && !ifExists)
      throw new AnalysisException("TABLE_OR_VIEW_NOT_FOUND", Map(
        "relationName" -> s"`$catName`.`${(ns :+ name).mkString("`.`")}`"))
    Seq.empty
  }
}

/** `ALTER VIEW v AS <query>` — replaces the definition text and schema
  * (the user column list does not survive: the new query names its own
  * columns, Spark's ALTER VIEW semantics). Comment/properties persist. */
private[sql] final case class GraftAlterViewAsCommand(
    catName: String, ns: Seq[String], name: String,
    originalText: Option[String], query: LogicalPlan)
  extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val cat = ViewResolution.graftCatalog(session, catName).get
    val hconf = session.sparkContext.hadoopConfiguration
    val old = ViewStore.load(cat.warehousePath, ns, name, hconf).getOrElse(
      throw new AnalysisException("TABLE_OR_VIEW_NOT_FOUND", Map(
        "relationName" -> s"`$catName`.`${(ns :+ name).mkString("`.`")}`")))
    val text = originalText.getOrElse(throw new IllegalArgumentException(
      "ALTER VIEW ... AS requires the original query text"))
    val cm = session.sessionState.catalogManager
    val analyzed = PlanBridge.ofRows(session, query)
    ViewStore.save(cat.warehousePath, ns, name, old.copy(
      sql = text,
      columnAliases = Seq.empty,
      currentCatalog = cm.currentCatalog.name,
      currentNamespace = cm.currentNamespace.toSeq,
      schemaJson = analyzed.schema.json), hconf)
    Seq.empty
  }
}

/** `DESCRIBE [EXTENDED] <view>` — answers from the stored definition's
  * recorded schema (EXTENDED adds the definition text and context). */
private[sql] final case class GraftDescribeViewCommand(
    catName: String, ns: Seq[String], name: String, isExtended: Boolean,
    override val output: Seq[Attribute]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val cat = ViewResolution.graftCatalog(session, catName).get
    val v = ViewStore.load(cat.warehousePath, ns, name,
      session.sparkContext.hadoopConfiguration).getOrElse(
      throw new AnalysisException("TABLE_OR_VIEW_NOT_FOUND", Map(
        "relationName" -> s"`$catName`.`${(ns :+ name).mkString("`.`")}`")))
    val schema = Option(v.schemaJson).filter(_.nonEmpty)
      .map(j => org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[org.apache.spark.sql.types.StructType])
      .getOrElse(new org.apache.spark.sql.types.StructType())
    val cols = schema.fields.toSeq.map(f =>
      Row(f.name, f.dataType.simpleString, null))
    if (!isExtended) cols
    else cols ++ Seq(
      Row("", "", ""),
      Row("# Detailed View Information", "", ""),
      Row("Name", (catName +: ns :+ name).mkString("."), ""),
      Row("Type", "VIEW", ""),
      Row("View Text", v.sql, ""),
      Row("View Catalog and Namespace",
        (v.currentCatalog +: v.currentNamespace).mkString("."), ""),
      Row("Comment", v.comment, ""))
  }
}

/** `SHOW CREATE TABLE <view>` — reconstructs the CREATE VIEW text. */
private[sql] final case class GraftShowCreateViewCommand(
    catName: String, ns: Seq[String], name: String,
    override val output: Seq[Attribute]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val cat = ViewResolution.graftCatalog(session, catName).get
    val v = ViewStore.load(cat.warehousePath, ns, name,
      session.sparkContext.hadoopConfiguration).getOrElse(
      throw new AnalysisException("TABLE_OR_VIEW_NOT_FOUND", Map(
        "relationName" -> s"`$catName`.`${(ns :+ name).mkString("`.`")}`")))
    val colList =
      if (v.columnAliases.isEmpty) ""
      else v.columnAliases.mkString(" (", ", ", ")")
    Seq(Row(s"CREATE VIEW ${(catName +: ns :+ name).mkString(".")}$colList " +
      s"AS ${v.sql}"))
  }
}

/** `ALTER VIEW v RENAME TO v2` — renames the stored definition within
  * its namespace (collisions with tables AND views refused). */
private[sql] final case class GraftRenameViewCommand(
    catName: String, ns: Seq[String], name: String, newName: String)
  extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val cat = ViewResolution.graftCatalog(session, catName).get
    val hconf = session.sparkContext.hadoopConfiguration
    val v = ViewStore.load(cat.warehousePath, ns, name, hconf).getOrElse(
      throw new AnalysisException("TABLE_OR_VIEW_NOT_FOUND", Map(
        "relationName" -> s"`$catName`.`${(ns :+ name).mkString("`.`")}`")))
    val target = org.apache.spark.sql.connector.catalog.Identifier
      .of(ns.toArray, newName)
    if (cat.tableExists(target) ||
        ViewStore.exists(cat.warehousePath, ns, newName, hconf))
      throw new AnalysisException("TABLE_OR_VIEW_ALREADY_EXISTS",
        Map("relationName" -> s"$catName.${(ns :+ newName).mkString(".")}"))
    ViewStore.save(cat.warehousePath, ns, newName, v, hconf)
    ViewStore.drop(cat.warehousePath, ns, name, hconf)
    Seq.empty
  }
}

/** `ANALYZE TABLE t COMPUTE STATISTICS [FOR COLUMNS c, ... | FOR ALL
  * COLUMNS]` — the ANSI spelling of `CALL graft.system.analyze`. The
  * column pass persists NDV/nulls/ranges/lengths for the CBO
  * ([[graft.lake.ColStats]]); the bare form is a successful no-op
  * because row/size statistics are always exact from the commit log. */
private[sql] final case class GraftAnalyzeCommand(
    catName: String, ns: Seq[String], name: String,
    columns: Seq[String], columnsPass: Boolean) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    if (!columnsPass) return Seq.empty
    val cat = ViewResolution.graftCatalog(session, catName).get
    val root = cat.tableRoot(ns, name)
    val desc = graft.lake.TableDescriptor.load(root,
      session.sparkContext.hadoopConfiguration).getOrElse(
      throw new AnalysisException("TABLE_OR_VIEW_NOT_FOUND", Map(
        "relationName" -> s"`$catName`.`${(ns :+ name).mkString("`.`")}`")))
    graft.lake.LakeTable(session, desc.config(root)).analyzeColumns(columns)
    Seq.empty
  }
}

/** `SHOW VIEWS IN cat.ns [LIKE 'pattern']` — carries the ORIGINAL
  * ShowViews node's output attributes so downstream projections keep
  * resolving against the same ids. */
private[sql] final case class GraftShowViewsCommand(
    catName: String, ns: Seq[String], pattern: Option[String],
    override val output: Seq[Attribute]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val cat = ViewResolution.graftCatalog(session, catName).get
    val names = ViewStore.list(cat.warehousePath, ns,
      session.sparkContext.hadoopConfiguration)
    val re = pattern.map(p =>
      p.split('|').map(w => java.util.regex.Pattern.quote(w)
        .replace("*", "\\E.*\\Q")).mkString("(?i)^(", "|", ")$").r)
    names.filter(n => re.forall(_.matches(n)))
      .map(n => Row(ns.mkString("."), n, false))
  }
}
