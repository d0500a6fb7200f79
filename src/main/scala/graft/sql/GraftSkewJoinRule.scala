package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}
import org.apache.spark.sql.types._

/** Plan-time skew-join mitigation driven by the ANALYZE frequent-items
  * stats ([[graft.lake.ColStats]], the exact top-K value counts kept for
  * NDV-capped string columns).
  *
  * The gap this closes: Catalyst plans a shuffle join blind to VALUE
  * skew on string keys — a 1000:1-hot key puts its entire mass in one
  * reducer, and AQE's skew handling only splits sort-merge partitions at
  * RUNTIME (after the skewed shuffle files exist; it cannot rescue a
  * shuffled-hash join, and it cannot avoid writing the skewed map
  * output). The frequent-items stats prove the hot key at PLAN time, so
  * the join can be re-shaped before any shuffle happens:
  *
  *   1. **Broadcast override** — when the non-skewed side's estimated
  *      size fits `spark.graft.skewJoin.broadcastMax` (default 64 MB; a
  *      deliberate raise over `autoBroadcastJoinThreshold`'s 10 MB for
  *      exactly this case), hint BROADCAST on it: no shuffle at all, so
  *      no skew. The threshold raise is safe precisely because the stats
  *      prove the alternative is a serialized reducer, not a balanced
  *      shuffle.
  *   2. **Key salting** — otherwise, rewrite to the proven two-phase
  *      shape (`salted_twophase_agg`, ops/Relational.scala, measured in
  *      SCALE.md): the skewed side gets a deterministic salt in
  *      [0, saltFactor) on its HOT key values (hash of the row, so the
  *      hot key's rows spread over saltFactor reducers), the other side
  *      replicates its hot-key rows once per salt, and the join adds
  *      `salt = salt` to its keys. Non-hot values keep salt 0 on both
  *      sides — replication cost is saltFactor × hot rows of the small
  *      side only, never the table.
  *
  * Both re-shapes preserve semantics exactly (the salt condition matches
  * each original pair exactly once — the hot set is the same literal
  * list on both sides, and null keys salt to 0 everywhere), so results
  * are pinned by every existing oracle; only the PLAN changes. Runs as a
  * pre-CBO rule: after operator optimization (scans are pushed-down
  * [[DataSourceV2ScanRelation]]s with commit-log-exact sizes) and before
  * join reordering.
  *
  * Scope guards (each bails to the untouched join): INNER joins (either
  * side skewed) and LEFT OUTER joins (skewed left/stream side only);
  * string or integral equi-keys that trace through Project/Filter to a
  * live graft scan whose ANALYZE artifact carries the evidence (string:
  * frequent items; integral: degenerate equi-height histogram bins); no
  * user join hints (the user's choice wins); not already salted
  * (idempotence).
  *
  * Disable per session with `spark.graft.skewJoin.enabled=false`.
  */
final case class GraftSkewJoinRule(spark: SparkSession)
  extends Rule[LogicalPlan] with PredicateHelper {

  import GraftSkewJoinRule._

  private def flag(k: String, dflt: String): String =
    conf.getConfString(s"spark.graft.skewJoin.$k", dflt)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!flag("enabled", "true").toBoolean) return plan
    val hotFraction = flag("hotFraction", "0.1").toDouble
    val saltFactor = math.max(flag("saltFactor", "16").toInt, 2)
    val broadcastMax = flag("broadcastMax", (64L * 1024 * 1024).toString).toLong
    val minRows = flag("minRows", "10000").toLong
    plan.transformUp {
      case j @ Join(_, _, jt, Some(_), hint)
          if (jt == Inner || jt == LeftOuter) &&
            hint.leftHint.forall(_.strategy.isEmpty) &&
            hint.rightHint.forall(_.strategy.isEmpty) &&
            !j.left.output.exists(_.name.startsWith(SaltCol)) &&
            !j.right.output.exists(_.name.startsWith(SaltCol)) =>
        mitigate(j, hotFraction, saltFactor, broadcastMax, minRows).getOrElse(j)
    }
  }

  /** hot-value evidence for one side's join-key attribute — hot values
    * carried as TYPED literals (string keys from the frequent-items
    * stats, numeric keys from the equi-height histogram) */
  private case class Skew(rows: Long, hotLits: Seq[Literal])

  /** trace `attr` through Project/Filter/aliases down to a graft DSv2
    * scan; answer the owning table's root + the physical column name */
  @annotation.tailrec
  private def originOf(attr: Attribute, plan: LogicalPlan): Option[(GraftTableV2, String)] =
    plan match {
      case r: DataSourceV2ScanRelation
          if r.output.exists(_.exprId == attr.exprId) =>
        r.relation.table match {
          case t: GraftTableV2 if t.pinnedAsOf.isEmpty => Some((t, attr.name))
          case _ => None
        }
      case r: DataSourceV2Relation if r.output.exists(_.exprId == attr.exprId) =>
        r.table match {
          case t: GraftTableV2 if t.pinnedAsOf.isEmpty => Some((t, attr.name))
          case _ => None
        }
      case p: Project =>
        p.projectList.find(_.exprId == attr.exprId) match {
          case Some(a: AttributeReference) => originOf(a, p.child)
          case Some(Alias(a: AttributeReference, _)) => originOf(a, p.child)
          case _ => None
        }
      case f: Filter => originOf(attr, f.child)
      case s: SubqueryAlias => originOf(attr, s.child)
      case _ => None
    }

  /** the ANALYZE evidence that `attr`'s source column is value-skewed.
    * STRING keys: frequent items carrying a value ≥ hotFraction of the
    * analyzed rows (exact top-K counts). NUMERIC keys: the equi-height
    * histogram — every bin holds 1/B of the non-null mass, so a value
    * owning fraction f of the rows shows up as ~f·B degenerate `[v, v]`
    * bins; count them (the standard equi-depth hot-value read-out). */
  private def skewOf(attr: Attribute, side: LogicalPlan,
      hotFraction: Double, minRows: Long): Option[Skew] = {
    val integral = attr.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (attr.dataType != StringType && !integral) return None
    originOf(attr, side).flatMap { case (t, colName) =>
      graft.lake.ColStats.load(t.tableRoot,
          spark.sparkContext.hadoopConfiguration)
        .filter(_.rows >= minRows)
        .flatMap { cs =>
          cs.cols.get(colName).flatMap { st =>
            if (attr.dataType == StringType) Option(st.freq).flatMap { fr =>
              val floor = math.max(math.ceil(cs.rows * hotFraction).toLong, 1L)
              val hot = fr.toSeq.filter(_._2 >= floor).map(_._1).sorted
              if (hot.isEmpty) None
              else Some(Skew(cs.rows,
                hot.map(v => Literal.create(v, StringType))))
            }
            else Option(st.hist).filter(_.nonEmpty).flatMap { bins =>
              val floor = math.max(math.ceil(bins.size * hotFraction).toLong, 2L)
              val hot = bins.filter(b => b.lo == b.hi)
                .groupBy(_.lo).toSeq
                .filter { case (v, bs) =>
                  bs.size >= floor && v == math.rint(v) }
                .map(_._1).sorted
              def lit(v: Double): Literal = attr.dataType match {
                case ByteType => Literal(v.toByte)
                case ShortType => Literal(v.toShort)
                case IntegerType => Literal(v.toInt)
                case _ => Literal(v.toLong)
              }
              if (hot.isEmpty) None
              else Some(Skew(cs.rows, hot.map(lit)))
            }
          }
        }
    }
  }

  private def mitigate(j: Join, hotFraction: Double, saltFactor: Int,
      broadcastMax: Long, minRows: Long): Option[LogicalPlan] = {
    // string equi-key pairs, normalized to (leftAttr, rightAttr)
    val keyPairs = splitConjunctivePredicates(j.condition.get).collect {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if j.left.outputSet.contains(a) && j.right.outputSet.contains(b) =>
        (a, b)
      case EqualTo(b: AttributeReference, a: AttributeReference)
          if j.left.outputSet.contains(a) && j.right.outputSet.contains(b) =>
        (a, b)
    }
    if (keyPairs.isEmpty) return None

    // first key pair with skew evidence; a LEFT OUTER join may only
    // re-shape around a skewed LEFT (stream) side — salting/broadcasting
    // the preserved side's mirror image would change its semantics
    val candidates = keyPairs.flatMap { case (la, ra) =>
      val ls = skewOf(la, j.left, hotFraction, minRows)
        .map(s => (s, la, ra, true))
      val rs =
        if (j.joinType == LeftOuter) None
        else skewOf(ra, j.right, hotFraction, minRows)
          .map(s => (s, la, ra, false))
      // both sides hot on the same key: mitigate around the bigger side
      (ls.toSeq ++ rs.toSeq).sortBy(-_._1.rows).headOption
    }
    val (skew, leftKey, rightKey, skewOnLeft) =
      candidates.sortBy(-_._1.rows).headOption.getOrElse(return None)

    val other = if (skewOnLeft) j.right else j.left
    val otherBytes = other.stats.sizeInBytes
    val auto = conf.autoBroadcastJoinThreshold
    if (auto > 0 && otherBytes <= auto) {
      // Spark broadcasts this on its own — nothing to fix
      None
    } else if (otherBytes <= broadcastMax) {
      // path 1: force-broadcast the non-skewed side — no shuffle, no skew
      val hi = Some(HintInfo(strategy = Some(BROADCAST)))
      val hint =
        if (skewOnLeft) j.hint.copy(rightHint = hi)
        else j.hint.copy(leftHint = hi)
      Some(j.copy(hint = hint))
    } else {
      // path 2: salt the skewed side's hot keys, replicate the other
      // side's hot-key rows once per salt
      salted(j, skew, leftKey, rightKey, skewOnLeft, saltFactor)
    }
  }

  private def salted(j: Join, skew: Skew, leftKey: Attribute,
      rightKey: Attribute, skewOnLeft: Boolean, saltFactor: Int)
      : Option[LogicalPlan] = {
    val (fact, dim) = if (skewOnLeft) (j.left, j.right) else (j.right, j.left)
    val (factKey, dimKey) = if (skewOnLeft) (leftKey, rightKey) else (rightKey, leftKey)
    val hotLits = skew.hotLits
    // both key sides must share the literal type exactly (the analyzer
    // is gone — a type-mismatched In would not be re-coerced)
    if (hotLits.exists(_.dataType != factKey.dataType) ||
      dimKey.dataType != factKey.dataType) return None

    // deterministic per-row salt: hash of the row's atomic columns — the
    // hot key's rows spread over saltFactor reducers; all other values
    // (and null keys, on both sides) stay at salt 0
    val hashIn = fact.output.filter(a => a.dataType match {
      case BooleanType | ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType | StringType | BinaryType | DateType |
           TimestampType | TimestampNTZType | _: DecimalType => true
      case _ => false
    })
    if (hashIn.isEmpty) return None
    val saltExpr = If(In(factKey, hotLits),
      Pmod(new Murmur3Hash(hashIn), Literal(saltFactor)), Literal(0))
    val factSalt = Alias(saltExpr, SaltCol + "f")()
    val factSide = Project(fact.output :+ factSalt, fact)

    // dim side: hot-key rows replicate once per salt value, the rest get
    // the single salt-0 replica — replication cost is bounded by the hot
    // rows of the SMALL side, never the fact
    val allSalts = CreateArray((0 until saltFactor).map(Literal(_)))
    val zeroSalt = CreateArray(Seq(Literal(0)))
    val dimSaltAttr = AttributeReference(SaltCol + "d", IntegerType, nullable = false)()
    val dimSide = Generate(
      Explode(If(In(dimKey, hotLits), allSalts, zeroSalt)),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(dimSaltAttr), dim)

    val saltEq = EqualTo(factSalt.toAttribute, dimSaltAttr)
    val cond = And(j.condition.get, saltEq)
    val joined =
      if (skewOnLeft) Join(factSide, dimSide, j.joinType, Some(cond), j.hint)
      else Join(dimSide, factSide, j.joinType, Some(cond), j.hint)
    // restore the original output (the added salt columns stay internal)
    Some(Project(j.output, joined))
  }
}

object GraftSkewJoinRule {
  /** internal salt column prefix — also the idempotence marker */
  private[graft] val SaltCol = "__graft_salt_"
}
