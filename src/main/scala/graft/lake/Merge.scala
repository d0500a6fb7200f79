package graft.lake

import org.apache.spark.sql.{Column, DataFrame}

/** Multi-clause MERGE INTO for [[LakeTable]] — the general row-level
  * mutation surface beyond precombine upsert (Hudi's spark-sql
  * `MERGE INTO`, reference write path `glue/HudiJarGlueJob.py:80-96`
  * generalized: that job hard-wires "latest precombine wins"; this builder
  * lets the caller decide per clause what a match means).
  *
  * Semantics follow ANSI/Delta MERGE:
  *   - target rows are matched to source rows on the table's record
  *     identity (key columns, plus partition columns on non-global-index
  *     tables — the same identity every other write path uses);
  *   - clauses are evaluated IN THE ORDER THEY WERE ADDED within their
  *     group; the first clause whose condition holds decides the row;
  *   - a matched target row with no applicable clause passes through
  *     unchanged; an unmatched source row with no applicable insert
  *     clause is discarded; an unmatched target row is kept unless a
  *     `whenNotMatchedBySource*` clause says otherwise.
  *
  * Cardinality: the source is first collapsed to ONE row per identity by
  * the table's precombine order (highest precombine wins, ties to arrival
  * order) — the Hudi resolution of the "multiple source rows match one
  * target row" error case that ANSI MERGE throws on. Deterministic, and
  * the collapse is a map-side-combinable hash aggregate, not a window.
  *
  * Column references inside conditions and assignment expressions use the
  * aliases `t` (target) and `s` (source): `col("t.l_quantity")`,
  * `expr("s.qty + t.qty")`. Assignments may not touch key or partition
  * columns (row identity is immutable — Hudi's rule).
  */
final class MergeBuilder private[lake] (
    table: LakeTable, source: DataFrame, val clauses: Seq[MergeClause],
    meta: Map[String, String] = Map.empty) {
  import MergeClause._

  private def add(c: MergeClause) =
    new MergeBuilder(table, source, clauses :+ c, meta)

  /** Attach commit metadata (small string key-values) that publishes
    * ATOMICALLY with the merge commit — e.g. the source watermark a
    * refresh applied (Delta commitInfo role). */
  def withCommitMeta(m: Map[String, String]): MergeBuilder =
    new MergeBuilder(table, source, clauses, meta ++ m)

  /** Matched rows: assign `set` columns (unassigned columns keep the
    * target value); applies when `cond` (over `t.*`/`s.*`) holds. */
  def whenMatchedUpdate(set: Map[String, Column], cond: Option[Column] = None): MergeBuilder =
    add(MergeClause(MatchedUpdate, cond, set))

  /** Matched rows: drop from the table when `cond` holds. */
  def whenMatchedDelete(cond: Option[Column] = None): MergeBuilder =
    add(MergeClause(MatchedDelete, cond, Map.empty))

  /** Unmatched source rows: insert, taking unassigned columns verbatim
    * from the source (columns absent there become null). */
  def whenNotMatchedInsert(values: Map[String, Column], cond: Option[Column] = None): MergeBuilder =
    add(MergeClause(NotMatchedInsert, cond, values))

  /** Unmatched source rows: insert the source row as-is. */
  def whenNotMatchedInsertAll(cond: Option[Column] = None): MergeBuilder =
    add(MergeClause(NotMatchedInsert, cond, Map.empty))

  /** Target rows with no source match: assign `set` when `cond` holds.
    * NOTE any by-source clause widens the rewrite scope to the whole
    * table — every partition can hold unmatched target rows. */
  def whenNotMatchedBySourceUpdate(set: Map[String, Column], cond: Option[Column] = None): MergeBuilder =
    add(MergeClause(BySourceUpdate, cond, set))

  /** Target rows with no source match: drop when `cond` holds. */
  def whenNotMatchedBySourceDelete(cond: Option[Column] = None): MergeBuilder =
    add(MergeClause(BySourceDelete, cond, Map.empty))

  /** Run the merge as one commit; returns the commit id (or the current
    * head when the merge is a provable no-op). */
  def execute(): Long = table.mergeImpl(source, clauses, meta)
}

final case class MergeClause(
    kind: MergeClause.Kind, cond: Option[Column], set: Map[String, Column])

object MergeClause {
  sealed trait Kind
  case object MatchedUpdate extends Kind
  case object MatchedDelete extends Kind
  case object NotMatchedInsert extends Kind
  case object BySourceUpdate extends Kind
  case object BySourceDelete extends Kind
}
