package graft.lake

/** Async table-service scheduler (Hudi's async compaction/cleaning
  * services, Delta's OPTIMIZE/VACUUM cadence — as a POLICY DRIVER
  * separate from the writer): reads the commit log, decides which
  * maintenance actions the timeline warrants, and fires them through
  * the SAME public LakeTable operations a human would call — so every
  * action rides the ordinary OCC machinery (basedOn head checks,
  * disjoint rebase) and is safe to run concurrently with live writers.
  *
  * A maintainer losing an optimistic race simply SKIPS the action
  * (reported, not thrown): maintenance is idempotent-by-need — if the
  * trigger still holds next round, the action re-fires; if a writer's
  * commit changed the picture, the trigger re-evaluates. Nothing here
  * holds locks, mutates descriptors, or bypasses the commit log.
  *
  * Triggers (all opt-in; 0/off by default):
  *   - `compactDeltaCommits`: MoR — compact when at least N delta
  *     commits accumulated since the last base-making commit (the async
  *     form of the inline `compactEvery` knob).
  *   - `smallFileBytes`: MoR — compactSmall when any partition holds
  *     more than one delta file under the threshold.
  *   - `retainCommits`: clean so only the last N commits stay
  *     travelable, once more than N have accumulated (plus timeline
  *     archival when the table's `archiveOnClean` is set).
  *   - `archiveAfter`: archive the non-travelable `_log/` prefix once
  *     the live listing exceeds N entries (independent of clean).
  *
  * Run one-shot via [[Maintenance.run]], or from SQL:
  * `CALL graft.system.maintain('db.t', retain, small_bytes)`.
  */
object Maintenance {

  final case class Policy(
      compactDeltaCommits: Int = 0,
      smallFileBytes: Long = 0L,
      retainCommits: Int = 0,
      archiveAfter: Int = 0,
      /** CoW: fold deletion vectors back into plain files once a
        * target's DV'd fraction reaches this ratio (0 = off) */
      dvFoldRatio: Double = 0.0,
      /** CoW: absolute cap on TOTAL live DV positions (0 = off) — the
        * backstop the ratio trigger cannot provide: a uniform low-ratio
        * delete spread across a huge table stays under every per-file
        * ratio while the V1-fallback read's position broadcast grows
        * without bound. Crossing the cap folds EVERY DV'd file (ratio
        * ~0), retiring all live positions in one pass. */
      dvFoldPositions: Long = 0L,
      /** refresh each registered materialized view once the source head
        * is at least N commits past its applied commit (0 = off; 1 =
        * keep MVs continuously fresh — which is also what keeps the
        * transparent rewrite eligible) */
      refreshMvAfter: Int = 0,
      /** re-run the column-stats ANALYZE pass once the head is at least
        * N commits past the analyzed commit (0 = off). Only re-analyzes
        * tables that were analyzed at least once — the first pass is a
        * deliberate operator decision (it costs a table scan). */
      analyzeAfter: Int = 0,
      /** bound each compactSmall/recluster fire to at most N partitions
        * per commit (0 = unbounded): small OCC windows, partial
        * progress on a deep backlog — the trigger re-fires next round
        * until drained (see [[LakeTable.compactSmall]]) */
      maxPartitionsPerCommit: Int = 0,
      /** rewrite live data back into cluster order once the fraction of
        * live bytes in cluster-ERODING files crosses this ratio (0 =
        * off; needs clusterCols). Eroding = delta files plus base files
        * produced by row-level write ops (upsert / merge / delete /
        * insert_overwrite / dv_update): each such commit range-orders
        * only ITS OWN output, so file ranges overlap ACROSS commits and
        * stats skipping degrades with every write. Globally-ordered
        * producers (bulk_insert, recluster, compact, dv_fold,
        * delta_compact) don't erode. */
      reclusterDriftRatio: Double = 0.0)

  /** One evaluation round: fire every action whose trigger holds.
    * Returns (action, result-or-skip) pairs — `("compact", -1)` with
    * reason "conflict" means a live writer won the race this round. */
  def run(t: LakeTable, p: Policy): Seq[(String, String)] = {
    val out = Seq.newBuilder[(String, String)]
    def fire(name: String)(body: => Any): Unit =
      try { val r = body; out += name -> String.valueOf(r) }
      catch {
        // a live writer won this round's race — maintenance is
        // idempotent-by-need, the trigger re-evaluates next round
        case _: CommitConflict => out += name -> "conflict-skipped"
      }
    if (!t.exists) return Seq.empty

    if (p.compactDeltaCommits > 0 && t.config.isMor) {
      val cs = t.log.commits
      val deltasSinceBase = cs.reverse
        .takeWhile(c => c.adds.forall(_.isDelta) && c.adds.nonEmpty).size
      if (deltasSinceBase >= p.compactDeltaCommits)
        fire("compact")(t.compact())
    }

    if (p.smallFileBytes > 0) {
      // MoR bins its change-log deltas; CoW bins small BASE files (the
      // shape every frequently-fed CoW table grows) — same criterion
      // compactSmall itself applies
      val small = t.log.liveFiles()
        .filter(f => (if (t.config.isMor) f.isDelta else !f.isDelta && !f.isDv) &&
          f.bytes > 0 && f.bytes < p.smallFileBytes)
        .groupBy(_.partition).exists(_._2.size > 1)
      if (small) fire("compact_small")(t.compactSmall(p.smallFileBytes,
        maxPartitionsPerCommit = p.maxPartitionsPerCommit))
    }

    if (p.dvFoldPositions > 0 && !t.config.isMor) {
      val totalPos = t.log.liveDvs().map(_.rows).sum
      if (totalPos > p.dvFoldPositions)
        fire("dv_fold_abs")(t.foldDvs(minRatio = Double.MinPositiveValue))
    }

    if (p.dvFoldRatio > 0 && !t.config.isMor) {
      val dvByTarget = t.log.liveDvs().groupBy(_.target)
        .map { case (k, ds) => k -> ds.map(_.rows).sum }
      val heavy = dvByTarget.nonEmpty && t.log.liveFiles().exists(f =>
        f.rows > 0L &&
          dvByTarget.getOrElse(f.path, 0L).toDouble / f.rows >= p.dvFoldRatio)
      if (heavy) fire("dv_fold")(t.foldDvs(p.dvFoldRatio))
    }

    if (p.reclusterDriftRatio > 0 && t.config.clusterCols.nonEmpty) {
      val live = t.log.liveFiles()
      val total = live.map(_.bytes).sum
      // total 0 = pre-upgrade commits without recorded sizes: no honest
      // ratio exists — skip rather than guess
      if (total > 0) {
        val clusteredOps =
          Set("bulk_insert", "recluster", "compact", "dv_fold", "delta_compact")
        val need = scala.collection.mutable.Map(
          live.filterNot(_.isDelta).map(f => f.path -> f).toSeq: _*)
        var eroded = live.filter(_.isDelta).map(_.bytes).sum
        // resolve each base file's PRODUCING commit op: walk the retained
        // timeline backwards with early exit (commit JSONs are memoized,
        // so repeat evaluations cost nothing new). Files whose add aged
        // past the retained region are treated as clustered —
        // conservative: drift can only be underestimated, never fires a
        // table-wide rewrite on stale evidence.
        var cursor = t.log.latestId.getOrElse(-1L)
        val floor = t.log.commits.headOption.map(_.id).getOrElse(0L)
        while (need.nonEmpty && cursor >= floor) {
          t.log.commitIfExists(cursor).foreach { c =>
            c.adds.foreach { a =>
              need.remove(a.path).foreach { f =>
                if (!clusteredOps.contains(c.op)) eroded += f.bytes
              }
            }
          }
          cursor -= 1
        }
        if (eroded.toDouble / total >= p.reclusterDriftRatio)
          fire("recluster")(t.recluster(
            maxPartitionsPerCommit = p.maxPartitionsPerCommit))
      }
    }

    if (p.retainCommits > 0) {
      val travelable = t.log.commits.count(_.id >= t.log.cleanedUpTo)
      if (travelable > p.retainCommits)
        fire("clean")(t.clean(p.retainCommits))
    }

    if (p.archiveAfter > 0 && t.log.commits.size > p.archiveAfter)
      fire("archive")(t.archiveTimeline())

    val hconf = t.spark.sparkContext.hadoopConfiguration
    if (p.refreshMvAfter > 0) {
      val head = t.log.latestId.getOrElse(-1L)
      val mvRoots = TableDescriptor.load(t.config.root, hconf)
        .map(d => Option(d.matViews).getOrElse(Seq.empty)).getOrElse(Seq.empty)
      mvRoots.foreach { root =>
        // dropped MVs leave stale registry entries — skip, don't fail
        for {
          mvDesc <- TableDescriptor.load(root, hconf)
          mv <- Option(mvDesc.matView)
          if mv.source == t.config.root
        } {
          // a BROKEN MV (e.g. a star-schema dim table dropped from under
          // it) must not abort the whole maintenance round — skip it,
          // report it, keep servicing every other MV (the rewrite path
          // already degrades the same way: Try → fall back)
          scala.util.Try(
            MaterializedAgg.fromDescriptor(t.spark, t, root, mv)) match {
            case scala.util.Success(agg) =>
              // a MOVED DIM (star-schema MVs) needs a refresh regardless
              // of the fact-lag threshold: the rebuild is what restores
              // rewrite eligibility, and dim moves are rare by design
              if (head - agg.applied.getOrElse(-1L) >= p.refreshMvAfter ||
                  !agg.dimsFresh)
                fire(s"refresh_mv:${root.split('/').last}")(agg.refresh())
            case scala.util.Failure(e) =>
              out += s"refresh_mv:${root.split('/').last}" ->
                s"skipped: ${e.getMessage}"
          }
        }
      }
    }

    if (p.analyzeAfter > 0) {
      val head = t.log.latestId.getOrElse(-1L)
      ColStats.load(t.config.root, hconf).foreach { cs =>
        if (head - cs.commit >= p.analyzeAfter)
          fire("analyze")(t.analyzeColumns())
      }
    }

    out.result()
  }
}
