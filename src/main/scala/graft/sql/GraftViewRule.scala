package graft.sql

import scala.util.Try

import org.apache.spark.sql.{AnalysisException, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{CTESubstitution, ResolvedIdentifier, UnresolvedRelation, UnresolvedSubqueryColumnAliases}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, EqualTo, Expression, PredicateHelper, SubqueryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

import graft.lake.{LakeTable, MaterializedAgg, MatViewDescriptor, TableDescriptor}

/** Read-side view resolution + `CREATE MATERIALIZED VIEW` interception.
  *
  * **Views**: an [[UnresolvedRelation]] that names a stored graft view
  * (real tables never reach here — relation resolution runs earlier in
  * the same analyzer batch, so anything still unresolved is either a
  * view or an error) is replaced by its parsed definition, expanded
  * EAGERLY: nested views substitute recursively inside one rule firing
  * with a seen-set, so reference cycles fail with a clear error instead
  * of exhausting analyzer iterations. Relation names inside a view body
  * are qualified in the DEFINER's frozen context (ANSI view semantics).
  * CTEs inside a body are substituted manually — the analyzer's
  * Substitution batch has already run by the time the body is spliced.
  *
  * **Materialized views**: Spark 4.1 parses `CREATE MATERIALIZED VIEW`
  * into [[CreateMaterializedViewAsSelect]] (for declarative-pipeline
  * catalogs) but ships no executor for it; graft claims the statement
  * when the identifier lands in a [[GraftCatalog]] and the (analyzed)
  * query is a single GROUP-BY aggregate over one graft table — exactly
  * the shape [[graft.lake.MaterializedAgg]] maintains incrementally.
  */
final case class GraftViewRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case u @ UnresolvedRelation(parts, _, false) =>
      substitute(parts, Set.empty).getOrElse(u)
    case c: CreateMaterializedViewAsSelect if c.query.resolved =>
      c.name match {
        case ResolvedIdentifier(cat: GraftCatalog, ident) =>
          GraftCreateMatViewCommand(cat.name,
            ident.namespace.toSeq, ident.name, c.query,
            c.originalText, c.ifNotExists, c.tableSpec.properties)
        case _ => c
      }
  }

  /** expand `parts` if it names a stored view; None = not a view */
  private def substitute(parts: Seq[String], seen: Set[Seq[String]])
      : Option[LogicalPlan] = {
    val hconf = spark.sparkContext.hadoopConfiguration
    for {
      (cat, ns, name) <- ViewResolution.resolve(spark, parts)
      v <- ViewStore.load(cat.warehousePath, ns, name, hconf)
    } yield {
      val full = (cat.name +: ns :+ name).map(_.toLowerCase)
      if (seen.contains(full))
        throw new AnalysisException("RECURSIVE_VIEW", Map(
          "viewIdent" -> full.mkString("."),
          "newPath" -> (seen.map(_.mkString(".")) + full.mkString(".")).mkString(" -> ")))
      val parsed = spark.sessionState.sqlParser.parsePlan(v.sql)
      // WITH clauses: the Substitution batch ran before this rule fires,
      // so spliced bodies must substitute their own CTEs
      val cted = CTESubstitution(parsed)
      val qualified = qualify(cted, v, seen + full)
      val aliased =
        if (v.columnAliases.nonEmpty)
          UnresolvedSubqueryColumnAliases(v.columnAliases, qualified)
        else qualified
      SubqueryAlias((cat.name +: ns :+ name).mkString("."), aliased)
    }
  }

  /** qualify every relation in a view body against the definer's frozen
    * context, expanding nested views inline (subqueries included) */
  private def qualify(p: LogicalPlan, v: ViewDef, seen: Set[Seq[String]])
      : LogicalPlan = {
    val cm = spark.sessionState.catalogManager
    def registered(n: String): Boolean = Try(cm.catalog(n)).isSuccess
    val relFixed = p.transformUp {
      case u @ UnresolvedRelation(parts, opts, false) =>
        val full = ViewResolution.qualify(
          parts, v.currentCatalog, v.currentNamespace, registered)
        substitute(full, seen).getOrElse(
          if (full == parts) u else UnresolvedRelation(full, opts, isStreaming = false))
    }
    relFixed.transformAllExpressions {
      case se: SubqueryExpression => se.withNewPlan(qualify(se.plan, v, seen))
    }
  }
}

/** `CREATE MATERIALIZED VIEW cat.ns.mv AS SELECT <dims>, count(*),
  * sum(<int expr>), min(...), max(...) FROM cat.ns.fact [JOIN
  * cat.ns.dim ON fact.k = dim.k]* [WHERE <pred>] GROUP BY <dims>`
  * — materialized as a [[graft.lake.MaterializedAgg]]-maintained
  * LakeTable at the MV's own warehouse path, registered on the FACT
  * table's descriptor for transparent rewrite ([[GraftMvRewrite]]) and
  * refreshed incrementally by `CALL graft.system.refresh_mv('ns.mv')`.
  *
  * Restrictions (each with a loud error): a left-deep tree of INNER
  * equi-joins over graft tables whose join keys share a name (USING
  * semantics) and whose non-key column names are disjoint; GROUP BY
  * plain columns (either side); measures limited to count(*) /
  * integer-typed sum / min / max — the algebra MaterializedAgg can
  * maintain exactly from the fact's change feed (a moved DIM triggers a
  * full rebuild — see [[graft.lake.MaterializedAgg]]). A WHERE clause is
  * accepted when deterministic and subquery-free (the MV maintains the
  * filtered aggregate). `avg` rewrites transparently via the per-sum
  * non-null counts the MV maintains; float sums would drift under
  * incremental add/subtract, so scale-and-cast
  * (`sum(CAST(x*100 AS BIGINT))`).
  */
private[sql] final case class GraftCreateMatViewCommand(
    catName: String, ns: Seq[String], name: String,
    query: LogicalPlan, originalText: String, ifNotExists: Boolean,
    properties: Map[String, String] = Map.empty)
  extends LeafRunnableCommand with PredicateHelper {

  override def run(session: SparkSession): Seq[Row] = {
    val cat = ViewResolution.graftCatalog(session, catName).getOrElse(
      throw new IllegalArgumentException(s"catalog $catName is not a graft catalog"))
    // TBLPROPERTIES: declared bounded staleness only — an unknown
    // property must fail loudly, not be silently dropped
    val (maxStaleness, maxStalenessMs) = properties.get("maxStaleness")
      .map(MvStaleness.parse).getOrElse((0, 0L))
    val unknown = properties.keySet - "maxStaleness"
    if (unknown.nonEmpty) throw new UnsupportedOperationException(
      s"unsupported materialized-view TBLPROPERTIES: ${unknown.mkString(", ")}" +
        " (supported: maxStaleness — rewrite-eligible commit lag or duration)")
    val hconf = session.sparkContext.hadoopConfiguration
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(ns.toArray, name)
    if (cat.tableExists(ident) ||
        ViewStore.exists(cat.warehousePath, ns, name, hconf)) {
      if (ifNotExists) return Seq.empty
      throw new AnalysisException("TABLE_OR_VIEW_ALREADY_EXISTS",
        Map("relationName" -> s"$catName.${(ns :+ name).mkString(".")}"))
    }

    def fail(why: String): Nothing = throw new UnsupportedOperationException(
      s"CREATE MATERIALIZED VIEW supports a GROUP-BY aggregate over one " +
        "graft fact table, optionally equi-joined (INNER or LEFT OUTER) to " +
        s"graft dimension tables (count(*) / integer sum / min / max); $why")

    def strip(p: LogicalPlan): LogicalPlan = p match {
      case SubqueryAlias(_, c) => strip(c)
      case other => other
    }
    val (groupings, aggExprs, child) = strip(query) match {
      case Aggregate(g, a, c, _) => (g, a, strip(c))
      case other => fail(s"got a ${other.nodeName} instead of an aggregate")
    }
    // SubqueryAlias plus the attr-only Projects the analyzer inserts
    // (USING-join dedup) are transparent for the shape analysis
    def stripJ(p: LogicalPlan): LogicalPlan = p match {
      case SubqueryAlias(_, c) => stripJ(c)
      case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        stripJ(c)
      case other => other
    }
    // an optional WHERE between the aggregate and the scan: the MV then
    // maintains agg(filter(source)) — any deterministic, subquery-free
    // predicate works for maintenance (it filters rows BEFORE
    // aggregation on every delta), and the rewrite requires query
    // predicates to contain it conjunct-for-conjunct
    val (filterCond, base) = stripJ(child) match {
      case Filter(c, f) => (Some(c), stripJ(f))
      case other => (None, other)
    }
    filterCond.foreach { c =>
      if (!c.deterministic)
        fail(s"the WHERE predicate ${c.sql} is nondeterministic — the MV " +
          "could never be refreshed to a reproducible state")
      if (SubqueryExpression.hasSubquery(c))
        fail(s"the WHERE predicate ${c.sql} contains a subquery — its " +
          "result changes outside the source's change feed")
    }
    // star-schema shape: a LEFT-DEEP tree of INNER equi-joins whose
    // leftmost relation is the FACT and every right side a DIM, joined
    // on SAME-NAMED columns (USING semantics — required so the joined
    // maintenance frame resolves measures by bare column name)
    def relOf(p: LogicalPlan): GraftTableV2 = stripJ(p) match {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTableV2] =>
        r.table.asInstanceOf[GraftTableV2]
      case other =>
        fail(s"every join input must be a graft table scan, got ${other.nodeName}")
    }
    val resolver = session.sessionState.conf.resolver
    def keyPairsOf(cond: Option[Expression],
        left: LogicalPlan, right: LogicalPlan): Seq[(String, String)] =
      cond.map(splitConjunctivePredicates).getOrElse(
        fail("JOIN needs an equi ON/USING condition")).map {
        case EqualTo(x: AttributeReference, y: AttributeReference) =>
          val (l, r) =
            if (left.outputSet.contains(x) && right.outputSet.contains(y)) (x, y)
            else if (left.outputSet.contains(y) && right.outputSet.contains(x)) (y, x)
            else fail(s"join condition must compare the two sides: ${x.sql} = ${y.sql}")
          (l.name, r.name)
        case other =>
          fail(s"only equi-joins on plain columns are supported, got ${other.sql}")
      }
    /** per dim: relation, fact-side keys, dim-side keys, LEFT?, dim
      * output attributes (for side-resolution checks) */
    def flatten(p: LogicalPlan): (GraftTableV2,
        Seq[(GraftTableV2, Seq[String], Seq[String], Boolean,
          Seq[org.apache.spark.sql.catalyst.expressions.Attribute])]) =
      stripJ(p) match {
        case Join(l, r, jt, cond, _)
            if jt == Inner || jt == org.apache.spark.sql.catalyst.plans.LeftOuter =>
          val (fact, ds) = flatten(l)
          val dim = relOf(r)
          val pairs = keyPairsOf(cond, l, r)
          (fact, ds :+ ((dim, pairs.map(_._1), pairs.map(_._2),
            jt != Inner, stripJ(r).output)))
        case j: Join =>
          fail(s"only INNER and LEFT OUTER joins are supported, got ${j.joinType}")
        case other => (relOf(other), Seq.empty)
      }
    val (table, dimRels) = flatten(base)
    (table +: dimRels.map(_._1)).foreach(t =>
      require(t.pinnedAsOf.isEmpty && !t.isReadOptimized,
        "a materialized view must be defined over live tables, not " +
          "time-travel or read-optimized snapshots"))
    def factNames(p: LogicalPlan): Set[String] = stripJ(p) match {
      case Join(l, _, _, _, _) => factNames(l)
      case other => other.output.map(_.name.toLowerCase).toSet
    }

    val dims = groupings.map {
      case a: AttributeReference => a.name
      case other => fail(s"GROUP BY must list plain columns, got ${other.sql}")
    }
    val integral = Set[org.apache.spark.sql.types.DataType](
      ByteType, ShortType, IntegerType, LongType)
    var sums = Map.empty[String, String]
    var mins = Map.empty[String, String]
    var maxs = Map.empty[String, String]
    var countCol = "n_rows"
    var countExposed = false
    // persisted expression text resolves by bare column name against
    // source-table frames (MaterializedAgg.aggOf, the rewrite matcher) —
    // the analyzed attributes carry catalog-qualified names, so strip
    def exprSql(e: Expression): String =
      e.transform {
        case a: AttributeReference => a.withQualifier(Seq.empty)
      }.sql
    aggExprs.foreach {
      case a: AttributeReference =>
        if (!dims.contains(a.name)) fail(s"non-grouping column ${a.name} in SELECT")
      case Alias(ae: AggregateExpression, outName) => ae.aggregateFunction match {
        case Count(Seq(org.apache.spark.sql.catalyst.expressions.Literal(1, _))) =>
          countCol = outName; countExposed = true
        case Sum(e, _) =>
          if (!integral.contains(e.dataType)) fail(
            s"sum(${e.sql}) is ${e.dataType.simpleString}: incremental " +
              "add/subtract is exact only for integers — scale and cast, " +
              "e.g. sum(CAST(x * 100 AS BIGINT))")
          sums += outName -> exprSql(e)
        case Min(e) => mins += outName -> exprSql(e)
        case Max(e) => maxs += outName -> exprSql(e)
        case other => fail(s"unsupported aggregate ${other.prettyName}")
      }
      case Alias(a: AttributeReference, _) =>
        if (!dims.contains(a.name)) fail(s"non-grouping column ${a.name} in SELECT")
      case other => fail(s"unsupported select item ${other.sql}")
    }
    if (dims.isEmpty) fail("GROUP BY is empty")

    // name discipline: a REFERENCED column name (GROUP BY, measure, or
    // WHERE ref) present on both sides of a join is ambiguous — the
    // maintenance frame and stored expression text resolve by bare name.
    // UNREFERENCED shared names (precombine timestamps etc.) are fine:
    // maintenance projects each dim to its keys + referenced columns.
    // Same-named join keys are exempt ONLY under the USING collapse
    // (one surviving column) — see the LEFT-join guard below.
    val referenced = (dims ++
      aggExprs.flatMap(_.references.map(_.name)) ++
      filterCond.toSeq.flatMap(_.references.map(_.name)))
      .map(_.toLowerCase).toSet
    val referencedAttrs: Seq[AttributeReference] = (groupings ++
      aggExprs.flatMap(_.references) ++ filterCond.toSeq.flatMap(_.references))
      .collect { case a: AttributeReference => a }
    var seenKept = factNames(base)
    dimRels.foreach { case (_, fks, dks, leftOuter, dimOut) =>
      val sameNamed = fks.zip(dks)
        .filter { case (f, d) => resolver(f, d) }.map(_._2.toLowerCase).toSet
      val lcDks = dks.map(_.toLowerCase).toSet
      // under a LEFT join the two sides of a same-named key DIVERGE
      // (fact value vs null-extension): a reference that resolves to
      // the DIM side of such a key cannot be expressed by bare name in
      // the maintenance frame — refuse with guidance. INNER keys are
      // value-equal, so either side is fine.
      if (leftOuter) {
        val dimOutSet = org.apache.spark.sql.catalyst.expressions
          .AttributeSet(dimOut)
        val bad = referencedAttrs.filter(a =>
          dimOutSet.contains(a) && sameNamed.contains(a.name.toLowerCase))
        if (bad.nonEmpty)
          fail("a LEFT JOIN's dim-side key shares its name with the fact " +
            s"key (${bad.map(_.name).distinct.mkString(", ")}); reference " +
            "the fact-side key instead, or rename the dim key")
      }
      // ON-style dim keys that are REFERENCED act like ordinary dim
      // columns (they survive the join): a same name on the fact side
      // is ambiguous unless it's a USING-collapsed pair
      val ambiguous =
        (dimOut.map(_.name.toLowerCase).toSet & seenKept) -- sameNamed & referenced
      if (ambiguous.nonEmpty)
        fail("referenced column names present on both sides of a join " +
          s"are ambiguous: ${ambiguous.mkString(", ")} — rename the dim columns")
      seenKept = seenKept ++ lcDks ++
        (dimOut.map(_.name.toLowerCase).toSet & referenced)
    }

    val mvRoot = ViewStore.dir(cat.warehousePath, ns).getParent
      .toString + "/" + name
    val source = table.lake
    val filterSql = filterCond.map(exprSql)
    val dimJoins = dimRels.map { case (d, fks, dks, lo, _) =>
      graft.lake.DimSide(d.lake, fks, dks, lo) }
    val mv = new MaterializedAgg(session, source, mvRoot, dims,
      sums, mins, maxs, countCol, filterSql, dimJoins)
    mv.refresh()

    // persist the MV definition inside its own table descriptor (the MV
    // IS a LakeTable — SELECT * FROM cat.ns.mv reads it natively) and
    // register it on the source — AND on every dim: the fact entry
    // drives the transparent rewrite, the dim entries pin the dim
    // columns the recipe reads against rename/drop and are skipped by
    // refresh/rewrite (mv.source != dim root)
    val mvDef = MatViewDescriptor(source.config.root, dims, sums, mins,
      maxs, countCol, countExposed, originalText, filterSql.orNull,
      dimRels.map { case (d, fks, dks, lo, _) =>
        // same-named inner pairs keep the legacy usingCols spelling
        // (older readers still understand the descriptor); anything
        // else persists the explicit key pairs + join type
        val sameNamedInner = !lo &&
          fks.zip(dks).forall { case (f, k) => resolver(f, k) }
        if (sameNamedInner) graft.lake.DimJoin(d.tableRoot, fks)
        else graft.lake.DimJoin(d.tableRoot, null, fks, dks,
          if (lo) "left" else "inner")
      },
      maxStalenessCommits = maxStaleness, maxStalenessMs = maxStalenessMs)
    val mvDesc = TableDescriptor.fromConfig(mv.table.config)
      .copy(matView = mvDef)
    TableDescriptor.save(mvRoot, mvDesc, hconf)
    (source.config.root +: dimRels.map(_._1.tableRoot)).distinct.foreach { root =>
      val d = TableDescriptor.load(root, hconf).getOrElse(
        throw new IllegalStateException(s"table descriptor vanished: $root"))
      val mvs = Option(d.matViews).getOrElse(Seq.empty)
      if (!mvs.contains(mvRoot))
        TableDescriptor.save(root, d.copy(matViews = mvs :+ mvRoot), hconf)
    }
    Seq.empty
  }
}

/** the `maxStaleness` TBLPROPERTY's two spellings (shared by CREATE
  * MATERIALIZED VIEW and ALTER TABLE SET TBLPROPERTIES): a bare
  * non-negative integer declares a COMMIT budget; a duration
  * (`'500ms'`, `'30s'`, `'5m'`, `'2h'`, `'1d'`) declares a WALL-CLOCK
  * budget gated on the commit timestamps already in the log — users
  * reason in time, and commit cadence varies wildly, so the commit
  * form is the wrong unit on a bursty table. */
private[sql] object MvStaleness {
  private val Duration = "(\\d+)(ms|s|m|h|d)".r

  /** (commit budget, wall-clock budget ms) — exactly one is non-zero
    * unless the property is '0' (back to the exact gate) */
  def parse(v: String): (Int, Long) = v.trim.toLowerCase match {
    case s if s.matches("\\d+") => (s.toInt, 0L)
    case Duration(n, unit) =>
      val ms = unit match {
        case "ms" => 1L
        case "s" => 1000L
        case "m" => 60000L
        case "h" => 3600000L
        case "d" => 86400000L
      }
      (0, n.toLong * ms)
    case other => throw new IllegalArgumentException(
      "maxStaleness must be a non-negative commit count or a duration " +
        s"('500ms', '30s', '5m', '2h', '1d'), got '$other'")
  }
}
