package graft.sql

import java.util.{Iterator => JIterator}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.lake.LakeTable

/** DSv2 stored procedures (`CALL graft.system.<proc>(...)`) — the SQL
  * face of the lake's maintenance operations (Iceberg's `CALL
  * catalog.system.*` shape, Spark 4's ProcedureCatalog API):
  *
  * {{{
  *   CALL graft.system.compact(table => 'db.t')
  *   CALL graft.system.compact_small('db.t', 67108864)
  *   CALL graft.system.clean('db.t', 10)
  *   CALL graft.system.vacuum('db.t', 3600000)
  *   CALL graft.system.savepoint('db.t', 3)
  *   CALL graft.system.release_savepoint('db.t', 3)
  *   CALL graft.system.restore('db.t', 0)
  *   CALL graft.system.rollback('db.t')
  *   CALL graft.system.checkpoint('db.t')
  * }}}
  *
  * Each returns one row `(result BIGINT)` — the resulting/affected
  * commit id, or a count for vacuum, or -1 when there was nothing to
  * do. Procedures act through the SAME LakeTable code paths as the
  * Scala API, so commit-log invariants (ownership guards, savepoint
  * pins, retired ids) hold identically.
  */
private[sql] object GraftProcedures {

  val Namespace: Array[String] = Array("system")

  /** procedure name → (extra params after `table`, action) */
  private val procs: Map[String, (Seq[(String, DataType)], (LakeTable, InternalRow) => Long)] = Map(
    "compact" -> (Seq.empty, (t, _) => t.compact()),
    "compact_small" -> (Seq("max_bytes" -> LongType),
      (t, in) => t.compactSmall(in.getLong(1))),
    "clean" -> (Seq("retain" -> IntegerType),
      (t, in) => { t.clean(in.getInt(1)); t.log.latestId.getOrElse(-1L) }),
    // time-based retention (KEEP_LATEST_BY_HOURS role): commits stamped
    // within the window stay travelable; same cleaning engine as clean
    "clean_older_than" -> (Seq("older_than_ms" -> LongType),
      (t, in) => { t.cleanOlderThan(in.getLong(1))
        t.log.latestId.getOrElse(-1L) }),
    "vacuum" -> (Seq("older_than_ms" -> LongType),
      (t, in) => t.vacuumOrphans(in.getLong(1)).size.toLong),
    "savepoint" -> (Seq("commit" -> LongType),
      (t, in) => { t.savepoint(in.getLong(1)); in.getLong(1) }),
    "release_savepoint" -> (Seq("commit" -> LongType),
      (t, in) => { t.releaseSavepoint(in.getLong(1)); in.getLong(1) }),
    "restore" -> (Seq("commit" -> LongType),
      (t, in) => { t.restoreTo(in.getLong(1)); t.log.latestId.getOrElse(-1L) }),
    "rollback" -> (Seq.empty, (t, _) => t.rollback().getOrElse(-1L)),
    "checkpoint" -> (Seq.empty,
      (t, _) => t.log.forceCheckpoint().getOrElse(-1L)),
    // timeline archival (Hudi archived-timeline role): compacts the
    // non-travelable prefix of _log/ into segment files; returns the
    // number of commits archived
    "archive_timeline" -> (Seq.empty, (t, _) => t.archiveTimeline().toLong),
    "recluster" -> (Seq.empty, (t, _) => t.recluster()),
    "create_tag" -> (Seq("name" -> StringType, "commit" -> LongType),
      (t, in) => { t.createTag(in.getUTF8String(1).toString, in.getLong(2))
        in.getLong(2) }),
    "drop_tag" -> (Seq("name" -> StringType),
      (t, in) => { val id = t.resolveTag(in.getUTF8String(1).toString)
        t.dropTag(in.getUTF8String(1).toString); id }),
    // branches (Iceberg writable refs): create at a commit (-1 = head),
    // read/write through `db.t.branch_<name>`, land atomically via
    // fast_forward, retire via drop_branch (refused while the source
    // still references published branch files)
    "create_branch" -> (Seq("name" -> StringType, "commit" -> LongType),
      (t, in) => t.createBranch(in.getUTF8String(1).toString,
        Some(in.getLong(2)).filter(_ >= 0)).log.latestId.getOrElse(-1L)),
    "fast_forward" -> (Seq("name" -> StringType),
      (t, in) => t.fastForward(in.getUTF8String(1).toString)),
    "drop_branch" -> (Seq("name" -> StringType),
      (t, in) => { t.dropBranch(in.getUTF8String(1).toString)
        t.log.latestId.getOrElse(-1L) }),
    // external-engine manifest export (Delta symlink-manifest role,
    // reference S6): writes the snapshot's live-file list under
    // `_manifests/` (-1 = head); returns the exported commit id
    "export_manifest" -> (Seq("commit" -> LongType),
      (t, in) => t.exportManifest(Some(in.getLong(1)).filter(_ >= 0))),
    // async table services (Hudi async compaction/cleaning role): one
    // policy round — compact when the table's compactEvery worth of
    // deltas accumulated, compactSmall under `small_bytes` (0 = off),
    // clean to `retain` (0 = off) + archive per archiveOnClean. Safe
    // under OCC against live writers (conflicts skip, re-fire next
    // round); returns the number of actions that actually ran
    "maintain" -> (Seq("retain" -> IntegerType, "small_bytes" -> LongType),
      (t, in) => graft.lake.Maintenance.run(t, graft.lake.Maintenance.Policy(
        compactDeltaCommits = t.config.compactEvery,
        smallFileBytes = in.getLong(2),
        retainCommits = in.getInt(1),
        // CoW DV hygiene rides the default policy: fold a file's DVs
        // once a tenth of its rows are position-deleted
        dvFoldRatio = 0.1,
        // registered materialized views stay continuously fresh (which
        // also keeps the transparent rewrite eligible); column stats
        // re-analyze once 10 commits stale — and only on tables an
        // operator analyzed at least once (the first pass costs a scan)
        refreshMvAfter = 1,
        analyzeAfter = 10))
        .count(_._2 != "conflict-skipped").toLong),
    // ANALYZE ... COMPUTE STATISTICS FOR COLUMNS role: one distributed
    // pass collecting per-column NDV / nulls / ranges / lengths, served
    // to Spark's CBO through the native scan's columnStats (enable
    // spark.sql.cbo.enabled + joinReorder.enabled to consume them).
    // Returns the analyzed commit id.
    "analyze" -> (Seq.empty, (t, _) => t.analyzeColumns().getOrElse(-1L)),
    // incremental materialized-view refresh (CREATE MATERIALIZED VIEW's
    // maintenance verb): reconstructs the MaterializedAgg recipe from
    // the MV's own descriptor and applies timeline deltas — O(changed
    // keys), never a source rescan. Returns the source commit now
    // reflected (-1 when the source has no commits yet).
    "refresh_mv" -> (Seq.empty, (t, _) => {
      val hconf = t.spark.sparkContext.hadoopConfiguration
      val mv = graft.lake.TableDescriptor.load(t.config.root, hconf)
        .flatMap(d => Option(d.matView))
        .getOrElse(throw new IllegalArgumentException(
          s"${t.config.root} is not a materialized view"))
      val srcDesc = graft.lake.TableDescriptor.load(mv.source, hconf)
        .getOrElse(throw new IllegalStateException(
          s"materialized-view source vanished: ${mv.source}"))
      val source = LakeTable(t.spark, srcDesc.config(mv.source))
      graft.lake.MaterializedAgg
        .fromDescriptor(t.spark, source, t.config.root, mv)
        .refresh().getOrElse(-1L)
    }))

  def names: Seq[String] = procs.keys.toSeq.sorted

  def load(name: String, resolveTable: String => LakeTable): Option[UnboundProcedure] =
    procs.get(name).map { case (extras, action) =>
      make(name, ("table" -> StringType) +: extras,
        in => action(resolveTable(in.getUTF8String(0).toString), in))
    }

  /** assemble a one-row `(result BIGINT)` procedure from its parameter
    * list and action — shared by the table-level procedures above and
    * catalog-level ones (vacuum_staging) built by [[GraftCatalog]] */
  def make(name: String, params: Seq[(String, DataType)],
      action: InternalRow => Long): UnboundProcedure = {
    // bind under a new name: inside the anonymous classes `name` would
    // resolve to the member being defined (infinite self-recursion)
    val procName = name
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String =
        s"graft lake maintenance: $procName"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = procName
          override def description(): String =
            s"graft lake maintenance: $procName"
          override def isDeterministic: Boolean = false
          override def parameters(): Array[ProcedureParameter] =
            params.map { case (n, dt) =>
              ProcedureParameter.in(n, dt).build() }.toArray
          override def call(input: InternalRow): JIterator[Scan] = {
            val result = action(input)
            java.util.List.of[Scan](new LocalScan {
              override def rows(): Array[InternalRow] =
                Array(InternalRow(result))
              override def readSchema(): StructType =
                new StructType().add("result", LongType)
              override def description(): String = s"graft.$procName result"
            }).iterator()
          }
        }
    }
  }
}
