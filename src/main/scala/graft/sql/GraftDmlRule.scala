package graft.sql

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, EqualNullSafe, EqualTo, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.{ColumnBridge, PlanBridge}

import graft.lake.{LakeTable, MergeBuilder}

/** Analyzer rule wiring SQL `UPDATE` and `MERGE INTO` on graft catalog
  * tables to the engine's merge machinery (Spark plans these natively
  * only for SupportsRowLevelOperations tables; the pre-row-level-API
  * lakehouse pattern — Delta's for years — is exactly this rule shape:
  * intercept the resolved logical command, run it as an eager command
  * through the table's own transaction layer).
  *
  * `DELETE FROM` needs no rule: [[GraftTableV2]] implements
  * SupportsDelete and Spark plans it natively.
  *
  * Both commands re-target resolved attribute references by NAME onto
  * the engine's merge-join aliases (`t` = target, `s` = source) — sound
  * because the merge join exposes exactly the two relations' columns
  * under those aliases. Subqueries in conditions are rejected (the
  * engine's merge is a single-pass join, not a general subquery host).
  */
final case class GraftDmlRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case u: UpdateTable if u.resolved && graftTable(u.table).isDefined =>
      GraftUpdateCommand(graftTable(u.table).get, u.assignments, u.condition)
    case m: MergeIntoTable if m.resolved && graftTable(m.targetTable).isDefined =>
      GraftMergeCommand(graftTable(m.targetTable).get,
        m.targetTable, m.sourceTable, m.mergeCondition,
        m.matchedActions, m.notMatchedActions, m.notMatchedBySourceActions)
    case o: OverwritePartitionsDynamic
        if o.resolved && graftTable(o.table).isDefined =>
      GraftDynamicOverwriteCommand(graftTable(o.table).get, o.query)
  }

  private def graftTable(plan: LogicalPlan): Option[GraftTableV2] =
    plan.collectFirst {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTableV2] =>
        r.table.asInstanceOf[GraftTableV2]
    }
}

private[sql] object Dml {
  /** resolved expression → Column usable on a frame exposing the same
    * column names (alias-qualified when `side` maps the attribute) */
  def toCol(e: Expression, side: Map[Long, String] = Map.empty): Column = {
    require(!SubqueryExpression.hasSubquery(e),
      "subqueries in UPDATE/MERGE conditions are not supported on graft tables")
    ColumnBridge.column(e.transform {
      case a: AttributeReference =>
        side.get(a.exprId.id) match {
          case Some(alias) => UnresolvedAttribute(Seq(alias, a.name))
          case None => UnresolvedAttribute.quoted(a.name)
        }
    })
  }

  /** drop alignment no-ops (col = col) and return name → value pairs */
  def sets(assignments: Seq[Assignment]): Seq[(String, Expression)] =
    assignments.flatMap { a =>
      (a.key, a.value) match {
        case (k: AttributeReference, v: AttributeReference)
          if k.exprId == v.exprId => None
        case (k: AttributeReference, v) => Some(k.name -> v)
        case (k, _) => throw new UnsupportedOperationException(
          s"only top-level column assignments are supported, got $k")
      }
    }
}

/** `UPDATE t SET ... WHERE ...` — executed as one merge commit: the
  * matching snapshot rows with assignments applied become the source;
  * every source row updates its target row. All assignment right-hand
  * sides evaluate against the OLD row (single projection — ANSI UPDATE
  * semantics even when one assigned column references another). */
/** dynamic `INSERT OVERWRITE` (`partitionOverwriteMode=dynamic` /
  * `writeTo(...).overwritePartitions()`): executed as
  * [[graft.lake.LakeTable.insertOverwrite]] — supersede exactly the
  * user partitions present in the batch, one commit. Spark cannot plan
  * this through the V1 write fallback (OverwritePartitionsDynamicExec
  * requires a native BatchWrite), so the same resolution-rule shape as
  * UPDATE/MERGE carries it; the analyzer has already aligned the query
  * output to the table's columns when `resolved` holds. */
private[sql] final case class GraftDynamicOverwriteCommand(
    table: GraftTableV2, query: LogicalPlan) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    table.lake.insertOverwrite(PlanBridge.ofRows(session, query))
    Seq.empty
  }
}

private[sql] final case class GraftUpdateCommand(
    table: GraftTableV2,
    assignments: Seq[Assignment],
    condition: Option[Expression]) extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    val lake = table.lake
    val sets = Dml.sets(assignments)
    val identity = (lake.config.keyCols ++ lake.config.partitionCols).toSet
    val bad = sets.map(_._1).toSet & identity
    require(bad.isEmpty,
      s"UPDATE may not assign key/partition columns: ${bad.mkString(",")}")
    // updateMode='dv' (CoW): position sidecars + new version files —
    // O(changed rows) written instead of the keyed file-group rewrite
    if (lake.config.updateMode == "dv" && !lake.config.isMor) {
      lake.updateDvWhere(
        condition.map(Dml.toCol(_))
          .getOrElse(org.apache.spark.sql.functions.lit(true)),
        sets.map { case (n, e) => n -> Dml.toCol(e) }.toMap)
      return Seq.empty
    }
    val snap = table.snapshot(None)
    val matching = condition.fold(snap)(c => snap.filter(Dml.toCol(c)))
    val setMap = sets.toMap
    val source = matching.select(snap.columns.map(c =>
      setMap.get(c).map(e => Dml.toCol(e).as(c)).getOrElse(col(c))): _*)
    lake.merge(source)
      .whenMatchedUpdate(sets.map { case (n, _) => n -> col(s"s.$n") }.toMap)
      .execute()
    Seq.empty
  }
}

/** `MERGE INTO t USING src ON <key equality> [AND <residual>] WHEN ...`
  * — mapped clause by clause onto [[MergeBuilder]] (same semantics:
  * first matching clause per row wins, source collapsed to one row per
  * key by precombine). The ON condition must CONTAIN the key-equality
  * conjunction over the table's record identity — the engine's merge IS
  * keyed; an arbitrary join-shaped ON would need a general join which
  * the table's upsert transaction model (rewrite touched partitions per
  * key) does not express. Remaining conjuncts (the Delta-idiomatic
  * `ON t.k = s.k AND t.region = 'EU'` shape) fold into every WHEN
  * MATCHED clause condition: they SCOPE the matched actions. On a
  * record-keyed table the NOT MATCHED sides stay key-defined — a source
  * row whose key exists is never re-inserted (a duplicate key is
  * unrepresentable here, unlike Delta), and a target row with a
  * key-partner is never "not matched by source"; a key-matched pair
  * failing the residual simply hits no clause. The source must expose
  * the table's key, partition, and precombine columns under the table's
  * column names. */
private[sql] final case class GraftMergeCommand(
    table: GraftTableV2,
    targetPlan: LogicalPlan,
    sourcePlan: LogicalPlan,
    mergeCondition: Expression,
    matchedActions: Seq[MergeAction],
    notMatchedActions: Seq[MergeAction],
    notMatchedBySourceActions: Seq[MergeAction]) extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    val lake = table.lake
    val tgtIds = targetPlan.outputSet.map(_.exprId.id).toSet
    val srcIds = sourcePlan.outputSet.map(_.exprId.id).toSet
    val side: Map[Long, String] =
      tgtIds.map(_ -> "t").toMap ++ srcIds.map(_ -> "s").toMap

    val residual: Option[Column] =
      splitOnCondition(lake).map(e => Dml.toCol(e, side)).reduceOption(_ && _)
    // user-facing surface for the documented Delta-parity deviation
    // (not just scaladoc): a ported Delta MERGE relying on "key matched
    // but residual failed → NOT MATCHED → insert" silently drops those
    // inserts here, so say it loud where the statement runs
    if (residual.isDefined && notMatchedActions.nonEmpty)
      logWarning("MERGE ON carries residual conjuncts beyond the key " +
        "equality: on this record-keyed table a source row whose key " +
        "EXISTS but fails the residual fires NO clause — it is not " +
        "treated as NOT MATCHED and will not be inserted (Delta would " +
        "insert it; a duplicate key is unrepresentable here). If the " +
        "insert was intended, scope with WHEN MATCHED AND <cond> / " +
        "WHEN NOT MATCHED AND <cond> instead of the ON residual.")

    val sourceDf = PlanBridge.ofRows(session, sourcePlan)
    val identityCols = (lake.config.keyCols ++ lake.config.partitionCols).toSet
    def cond(c: Option[Expression]): Option[Column] =
      c.map(e => Dml.toCol(e, side))
    /** matched-clause condition with the ON residual folded in — the
      * residual scopes WHICH key-matched pairs the clause may touch */
    def matchedCond(c: Option[Expression]): Option[Column] =
      (residual, cond(c)) match {
        case (Some(r), Some(cc)) => Some(r && cc)
        case (r, cc) => r.orElse(cc)
      }
    def setMap(assignments: Seq[Assignment]): Map[String, Column] =
      Dml.sets(assignments).map { case (n, e) => n -> Dml.toCol(e, side) }.toMap
    /** [[setMap]] for UPDATE clauses: drops an identity-column
      * assignment when it is the SAME-NAMED source column — the
      * analyzer expands `UPDATE SET *` into exactly those, and the
      * validated key-equality ON makes them provable no-ops (a row's
      * identity is immutable under update on this table). Any OTHER
      * identity assignment is kept and rejected downstream. */
    def updateSetMap(assignments: Seq[Assignment]): Map[String, Column] =
      Dml.sets(assignments).filterNot { case (n, e) =>
        identityCols.contains(n) && (e match {
          case a: AttributeReference =>
            srcIds.contains(a.exprId.id) && a.name.equalsIgnoreCase(n)
          case _ => false
        })
      }.map { case (n, e) => n -> Dml.toCol(e, side) }.toMap

    // `UPDATE SET *` / `INSERT *`: every target user column taken from
    // the same-named source column. UPDATE SET * drops the identity
    // (key/partition) columns from the expansion rather than rejecting
    // the statement: the validated ON clause already pins t.key = s.key
    // (the assignment is a provable no-op there), and a row's identity
    // is immutable under update on this table — so SET * means "update
    // every non-identity column", the only executable ANSI reading.
    val userCols = table.schema().fieldNames.toSeq
    val srcNames = sourcePlan.output.map(_.name).toSet
    def starSet(exclude: Set[String]): Map[String, Column] = {
      val cols = userCols.filterNot(exclude.contains)
      val missing = cols.filterNot(srcNames.contains)
      require(missing.isEmpty,
        s"MERGE * requires the source to carry every table column; missing: ${missing.mkString(",")}")
      cols.map(c => c -> col(s"s.$c")).toMap
    }

    // clause order within each group is preserved — first match wins,
    // the same contract MergeBuilder executes
    var b: MergeBuilder = lake.merge(sourceDf)
    matchedActions.foreach {
      case UpdateAction(c, asgn, _) => b = b.whenMatchedUpdate(updateSetMap(asgn), matchedCond(c))
      case UpdateStarAction(c) => b = b.whenMatchedUpdate(starSet(identityCols), matchedCond(c))
      case DeleteAction(c) => b = b.whenMatchedDelete(matchedCond(c))
      case other => throw new UnsupportedOperationException(
        s"unsupported WHEN MATCHED action: $other")
    }
    notMatchedActions.foreach {
      case InsertAction(c, asgn) => b = b.whenNotMatchedInsert(setMap(asgn), cond(c))
      case InsertStarAction(c) => b = b.whenNotMatchedInsertAll(cond(c))
      case other => throw new UnsupportedOperationException(
        s"unsupported WHEN NOT MATCHED action: $other")
    }
    notMatchedBySourceActions.foreach {
      case UpdateAction(c, asgn, _) => b = b.whenNotMatchedBySourceUpdate(setMap(asgn), cond(c))
      case DeleteAction(c) => b = b.whenNotMatchedBySourceDelete(cond(c))
      case other => throw new UnsupportedOperationException(
        s"unsupported WHEN NOT MATCHED BY SOURCE action: $other")
    }
    b.execute()
    Seq.empty
  }

  /** Split the ON clause: its conjuncts must INCLUDE t.k = s.k (or <=>)
    * equalities covering the table's full record identity, with the
    * source column carrying the same name; every other conjunct is
    * returned as a residual for the matched clauses to fold in. An
    * identity equality listed twice, or an equality on a non-identity
    * column, is residual too (it still scopes, it just doesn't key). */
  private def splitOnCondition(lake: LakeTable): Seq[Expression] = {
    val tgtIds = targetPlan.outputSet.map(_.exprId.id).toSet
    val srcIds = sourcePlan.outputSet.map(_.exprId.id).toSet
    def split(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) => split(l) ++ split(r)
      case other => Seq(other)
    }
    val keyed = ((if (lake.config.globalIndex) Seq.empty
      else lake.config.partitionCols) ++ lake.config.keyCols).toSet
    /** an identity conjunct is exactly t.k = s.k with matching names on
      * an identity column — anything else stays a residual */
    def identityPair(e: Expression): Option[String] = {
      val ab = e match {
        case EqualTo(a: AttributeReference, b: AttributeReference) => Some((a, b))
        case EqualNullSafe(a: AttributeReference, b: AttributeReference) => Some((a, b))
        case _ => None
      }
      ab.flatMap {
        case (a, b) if tgtIds.contains(a.exprId.id) && srcIds.contains(b.exprId.id) => Some((a, b))
        case (a, b) if srcIds.contains(a.exprId.id) && tgtIds.contains(b.exprId.id) => Some((b, a))
        case _ => None
      }.collect {
        case (t, s) if t.name == s.name && keyed.contains(t.name) => t.name
      }
    }
    val (idPairs, residual) = split(mergeCondition).foldLeft(
      (Set.empty[String], Seq.empty[Expression])) { case ((ids, res), e) =>
      identityPair(e) match {
        case Some(n) if !ids.contains(n) => (ids + n, res)
        case _ => (ids, res :+ e)
      }
    }
    require(idPairs == keyed,
      s"MERGE ON must include t.k = s.k equalities (same column name on " +
        s"both sides) over the full record identity (${keyed.mkString(",")}), " +
        s"got (${idPairs.mkString(",")})")
    residual
  }
}
