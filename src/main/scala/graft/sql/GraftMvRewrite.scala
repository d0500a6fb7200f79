package graft.sql

import scala.util.Try

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.lake.{LakeTable, MaterializedAgg, MatViewDescriptor, TableDescriptor}

/** Transparent materialized-view rewrite (the BigQuery/Calcite
  * aggregate-rewrite role): a GROUP-BY aggregate over a graft table —
  * or over a star-schema join tree of graft tables matching an MV's
  * declared fact⋈dims shape — whose registered MV covers it: dims a
  * superset of the query's grouping columns, every measure derivable
  * (`count(*)` → Σ count, `sum(e)` → Σ sum-col, `avg(e)` → Σ sum / Σ
  * non-null count, `min`/`max` → min/max over the MV, the classic
  * rollup algebra) — is answered from the MV instead of the join/scan,
  * but ONLY when the MV is exactly fresh (applied fact commit IS the
  * fact head, every dim head unchanged since the MV's last refresh). A
  * stale or non-covering MV silently falls through to the base plan, so
  * the rewrite can never change a result — freshness is re-checked per
  * statement at optimization time.
  *
  * This is the 100 TB payoff of [[graft.lake.MaterializedAgg]]'s
  * incremental maintenance: the dashboard aggregate that would scan the
  * fact table answers from a dimension-cardinality table in
  * milliseconds, and stays answerable because refresh cost is
  * O(changed keys), never O(table).
  *
  * Runs as an injected operator-optimization rule, which in Spark 4.1
  * fires BEFORE the early scan-pushdown batch — relations are still
  * [[DataSourceV2Relation]]s and residual [[Filter]]s still sit in the
  * plan (verified empirically), so matching `Aggregate [→ Project] [→
  * Filter] → relation` sees the complete row-semantics of the subtree.
  * A filter is rewritten onto the MV when it references only dimension
  * columns; anything else disqualifies the rewrite.
  *
  * Disable per session with `spark.graft.mvRewrite=false`.
  */
final case class GraftMvRewrite(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.mvRewrite", "true").toBoolean) return plan
    plan.transformUp {
      case agg @ Aggregate(groupings, aggExprs, child, None) =>
        tryRewrite(groupings, aggExprs, child).getOrElse(agg)
    }
  }

  /** the matched subtree: filter conjuncts, the FACT relation, the
    * star-schema joins (dim table, fact/dim key pairs, LEFT?), and the
    * combined relation outputs stored expressions resolve against */
  private case class Unwrapped(
      cond: Option[Expression],
      fact: GraftTableV2,
      joins: Seq[(GraftTableV2, Seq[(String, String)], Boolean)],
      outputs: Seq[Attribute])

  private def asGraft(p: LogicalPlan): Option[(GraftTableV2, Seq[Attribute])] =
    p match {
      case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        asGraft(c)
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTableV2] =>
        Some((r.table.asInstanceOf[GraftTableV2], r.output))
      case _ => None
    }

  /** extract (fact-side, dim-side) key pairs from an equi-join
    * condition — None when any conjunct isn't a two-sided equality of
    * plain columns */
  private def keyPairsOf(cond: Option[Expression],
      l: LogicalPlan, r: LogicalPlan): Option[Seq[(String, String)]] =
    cond.map(splitConjunctivePredicates).flatMap { conjs =>
      val pairs = conjs.map {
        case EqualTo(a: AttributeReference, b: AttributeReference) =>
          if (l.outputSet.contains(a) && r.outputSet.contains(b))
            Some((a.name, b.name))
          else if (l.outputSet.contains(b) && r.outputSet.contains(a))
            Some((b.name, a.name))
          else None
        case _ => None
      }
      if (pairs.forall(_.isDefined)) Some(pairs.flatten) else None
    }

  /** Aggregate [→ Project(attrs)] [→ Filter] → left-deep inner
    * equi-join tree of graft scans (single relation = no joins) */
  private def unwrap(p: LogicalPlan): Option[Unwrapped] = p match {
    case Project(projList, c) if projList.forall(_.isInstanceOf[AttributeReference]) =>
      unwrap(c)
    case Filter(cond, c) => unwrap(c) match {
      // two stacked filters fold; a filter above a project still only
      // references live attrs, so unwrapping order doesn't matter
      case Some(u) =>
        Some(u.copy(cond = Some(u.cond.map(And(_, cond)).getOrElse(cond))))
      case None => None
    }
    case Join(l, r, jt, cond, _)
        if jt == Inner || jt == org.apache.spark.sql.catalyst.plans.LeftOuter =>
      for {
        u <- unwrap(l)
        // a LEFT-side filter (the optimizer pushes the query's WHERE
        // below the join before this rule fires) references only the
        // preserved side, so it COMMUTES with both INNER and LEFT OUTER
        // joins — fold it into the top-level conjuncts the matcher
        // compares. A filtered DIM side never matches asGraft and keeps
        // disqualifying the rewrite (dim filters don't commute under
        // LEFT OUTER null-extension).
        (dim, dimOut) <- asGraft(r)
        pairs <- keyPairsOf(cond, l, r)
      } yield u.copy(joins = u.joins :+ ((dim, pairs, jt != Inner)),
        outputs = u.outputs ++ dimOut)
    case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTableV2] =>
      Some(Unwrapped(None, r.table.asInstanceOf[GraftTableV2], Seq.empty, r.output))
    case _ => None
  }

  /** the query's join set must equal the MV's (root + key pairs + join
    * type, order-free), every dim live (no pin, no `.ro`) */
  private def joinsMatch(mv: MatViewDescriptor,
      qjoins: Seq[(GraftTableV2, Seq[(String, String)], Boolean)]): Boolean = {
    val want = Option(mv.dimJoins).getOrElse(Seq.empty)
      .map(dj => (dj.root,
        dj.factKeysN.map(_.toLowerCase).zip(dj.dimKeysN.map(_.toLowerCase)).toSet,
        dj.leftOuter))
      .sortBy(_._1)
    val got = qjoins
      .map { case (t, pairs, lo) => (t.tableRoot,
        pairs.map { case (f, d) => (f.toLowerCase, d.toLowerCase) }.toSet, lo) }
      .sortBy(_._1)
    want == got &&
      qjoins.forall { case (t, _, _) => t.pinnedAsOf.isEmpty && !t.isReadOptimized }
  }

  private def tryRewrite(
      groupings: Seq[Expression],
      aggExprs: Seq[NamedExpression],
      child: LogicalPlan): Option[LogicalPlan] = {
    val u = unwrap(child) match {
      case Some(x) => x
      case None => return None
    }
    val (cond, table) = (u.cond, u.fact)
    // only the LIVE table (not time travel / .ro / a branch — branch
    // roots differ from the registered source root, checked below)
    if (table.pinnedAsOf.nonEmpty || table.isReadOptimized) return None
    val mvRoots = Option(table.descriptor.matViews).getOrElse(Seq.empty)
    if (mvRoots.isEmpty) return None

    // the query must group by plain columns
    val groupCols = groupings.map {
      case a: AttributeReference => a
      case _ => return None
    }
    // a nondeterministic predicate evaluates once per SOURCE row; moved
    // onto the pre-aggregated MV it would fire once per group and change
    // counts/sums — and rand() contributes no references, so the
    // dim-only reference check alone cannot catch it. Subqueries carry
    // their own plans whose semantics the conjunct matcher can't compare.
    if (cond.exists(c => !c.deterministic || SubqueryExpression.hasSubquery(c)))
      return None
    val hconf = spark.sparkContext.hadoopConfiguration

    mvRoots.iterator.flatMap { mvRoot =>
      (for {
        mvDesc <- Try(TableDescriptor.load(mvRoot, hconf)).toOption.flatten
        mv <- Option(mvDesc.matView)
        if mv.source == table.tableRoot
        if joinsMatch(mv, u.joins)
        if groupCols.forall(g => mv.dims.exists(conf.resolver(_, g.name)))
        plan <- build(mv, mvRoot, mvDesc, table, u.outputs, groupCols, aggExprs, cond)
      } yield plan).iterator
    }.nextOption()
  }

  private def build(
      mv: MatViewDescriptor, mvRoot: String, mvDesc: TableDescriptor,
      table: GraftTableV2, relOutputs: Seq[Attribute],
      groupCols: Seq[AttributeReference], aggExprs: Seq[NamedExpression],
      cond: Option[Expression]): Option[LogicalPlan] = {

    // resolve the MV's stored measure expressions against the matched
    // relations' combined output (fact + dims), so a query aggregate can
    // be matched SEMANTICALLY (not by SQL-text accident). A join key
    // appears on both sides with equal values under the inner equi-join,
    // so first-found resolution is value-correct.
    def resolveStored(sqlText: String): Option[Expression] =
      Try(spark.sessionState.sqlParser.parseExpression(sqlText).transformUp {
        case u: UnresolvedAttribute if u.nameParts.length == 1 =>
          relOutputs.find(a => conf.resolver(a.name, u.nameParts.head))
            .getOrElse(return None)
      }).toOption.filter(_.resolved)
    lazy val storedSums = mv.sums.flatMap { case (c, s) => resolveStored(s).map(c -> _) }
    lazy val storedMins = mv.mins.flatMap { case (c, s) => resolveStored(s).map(c -> _) }
    lazy val storedMaxs = mv.maxs.flatMap { case (c, s) => resolveStored(s).map(c -> _) }
    def matching(stored: Map[String, Expression], e: Expression): Option[String] =
      stored.collectFirst { case (c, se) if se.semanticEquals(e) => c }

    // filter containment: every conjunct of the MV's own WHERE must
    // appear (semantically) among the query's conjuncts — the MV holds
    // only filtered rows, so a query that doesn't restate the predicate
    // asks for rows the MV lost. Conjuncts the MV did NOT bake in are
    // the residual; they can only be applied on the MV when they
    // reference dimension columns alone (group-constant, so filtering
    // groups equals filtering rows).
    val queryConjuncts = cond.toSeq.flatMap(splitConjunctivePredicates)
    val mvConjuncts = Option(mv.filterSql).filter(_.nonEmpty) match {
      case Some(f) => resolveStored(f) match {
        case Some(e) => splitConjunctivePredicates(e)
        case None => return None
      }
      case None => Seq.empty
    }
    if (mvConjuncts.exists(m => !queryConjuncts.exists(_.semanticEquals(m))))
      return None
    val residual = queryConjuncts
      .filterNot(q => mvConjuncts.exists(_.semanticEquals(q)))
    if (!residual.forall(_.references.forall(a =>
      mv.dims.exists(conf.resolver(_, a.name))))) return None

    // classify every output BEFORE touching the MV plan: any
    // unsupported shape disqualifies the whole rewrite
    sealed trait Out
    case class Dim(name: String) extends Out
    case object CountAll extends Out
    case class SumOf(col: String) extends Out
    case class MinOf(col: String) extends Out
    case class MaxOf(col: String) extends Out
    case class AvgOf(col: String) extends Out
    val outs: Seq[(NamedExpression, Out)] = aggExprs.map {
      case a: AttributeReference if groupCols.exists(_.exprId == a.exprId) =>
        a -> Dim(a.name)
      case al @ Alias(a: AttributeReference, _)
          if groupCols.exists(_.exprId == a.exprId) =>
        al -> Dim(a.name)
      case al @ Alias(ae: AggregateExpression, _)
          if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case Count(Seq(Literal(1, _))) => al -> CountAll
          case Sum(e, _) => al -> SumOf(matching(storedSums, e).getOrElse(return None))
          case Min(e) => al -> MinOf(matching(storedMins, e).getOrElse(return None))
          case Max(e) => al -> MaxOf(matching(storedMaxs, e).getOrElse(return None))
          // avg(e) over an integral e decomposes exactly onto the MV:
          // Σ sum-col / Σ nn-col (the maintained NON-NULL count — avg
          // ignores nulls, so n_rows would be wrong under null values).
          // MV sums are declared integer-widened (`sum(CAST(x AS
          // BIGINT))`), so also match avg(x) through a lossless widening
          // cast of the query's child — same values, same null mask.
          case Average(e, _) =>
            val widened = e.dataType match {
              case org.apache.spark.sql.types.ByteType |
                   org.apache.spark.sql.types.ShortType |
                   org.apache.spark.sql.types.IntegerType =>
                matching(storedSums,
                  Cast(e, org.apache.spark.sql.types.LongType))
              case _ => None
            }
            al -> AvgOf(matching(storedSums, e).orElse(widened)
              .getOrElse(return None))
          case _ => return None
        }
      case _ => return None
    }

    // freshness: the MV must reflect the fact head — exactly by
    // default, or within its DECLARED staleness bound (`maxStaleness`
    // MVs serve answers pinned to the applied snapshot while the head
    // is ≤ N commits past it; a live trickle-written fact then keeps
    // answering from the MV between maintenance refreshes instead of
    // silently full-scanning). Dims must be unmoved either way. Checked
    // last because it costs metadata IO (marker read + head listings).
    val source = table.lake
    if (source.log.latestId.isEmpty) return None
    // a vanished dim (dropped table) must fall back, not fail the query
    val agg = Try(MaterializedAgg.fromDescriptor(spark, source, mvRoot, mv))
      .toOption.getOrElse(return None)
    val freshEnough = agg.freshWithin(mv.maxStalenessCommits) ||
      (mv.maxStalenessMs > 0 && agg.freshWithinMs(mv.maxStalenessMs))
    if (!freshEnough) return None

    // splice the MV read as an analyzed subtree (aliases stripped — the
    // Finish-Analysis batch already ran) and re-aggregate on it
    val mvScan = org.apache.spark.sql.catalyst.analysis.EliminateSubqueryAliases(
      agg.table.read().queryExecution.analyzed)
    // nested defs cannot non-locally return from build, so attribute
    // lookup is Option-typed and every USE site (all inside build's own
    // lambdas) bails the rewrite on a miss
    def mvAttrOpt(n: String): Option[AttributeReference] =
      mvScan.output.collectFirst {
        case a: AttributeReference if conf.resolver(a.name, n) => a
      }
    val countAttr =
      mvAttrOpt(Option(mv.countCol).getOrElse("n_rows")).getOrElse(return None)

    // dims the query doesn't group by are rolled up; nullability must
    // not WIDEN versus the original output (parents may rely on it).
    // Only the RESIDUAL conjuncts apply on the MV — the MV-baked ones
    // already restricted its rows at maintenance time.
    val filtered = residual.reduceOption(And) match {
      case Some(c) => Filter(c.transformUp {
        case a: AttributeReference => mvAttrOpt(a.name).getOrElse(return None)
      }, mvScan)
      case None => mvScan
    }
    val newGroupings = groupCols.map(g => mvAttrOpt(g.name).getOrElse(return None))
    val newAggs: Seq[NamedExpression] = outs.map { case (orig, out) =>
      val e: Expression = out match {
        case Dim(n) => mvAttrOpt(n).getOrElse(return None)
        case CountAll =>
          Coalesce(Seq(Sum(countAttr).toAggregateExpression(), Literal(0L)))
        case SumOf(c) => Sum(mvAttrOpt(c).getOrElse(return None)).toAggregateExpression()
        case MinOf(c) => Min(mvAttrOpt(c).getOrElse(return None)).toAggregateExpression()
        case MaxOf(c) => Max(mvAttrOpt(c).getOrElse(return None)).toAggregateExpression()
        case AvgOf(c) =>
          // Σ sum / Σ nn, null when no non-null values survive (SQL avg
          // of an empty/all-null group). The nn column only exists on
          // MVs built with non-null-count maintenance — missing on a
          // pre-upgrade MV ⇒ bail to the base scan.
          val sumA = mvAttrOpt(c).getOrElse(return None)
          val nnA = mvAttrOpt(MaterializedAgg.nnCol(c)).getOrElse(return None)
          val sumTot = Sum(sumA).toAggregateExpression()
          val nnTot = Sum(nnA).toAggregateExpression()
          If(EqualTo(Coalesce(Seq(nnTot, Literal(0L))), Literal(0L)),
            Literal(null, org.apache.spark.sql.types.DoubleType),
            Divide(Cast(sumTot, org.apache.spark.sql.types.DoubleType),
              Cast(nnTot, org.apache.spark.sql.types.DoubleType)))
      }
      if (e.dataType != orig.dataType) return None
      if (e.nullable && !orig.nullable) return None
      Alias(e, orig.name)(exprId = orig.exprId)
    }
    logInfo(s"rewriting aggregate over ${table.tableRoot} onto fresh " +
      s"materialized view $mvRoot")
    Some(Aggregate(newGroupings, newAggs, filtered))
  }
}
