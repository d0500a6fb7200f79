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
    AttributeReference("commit", LongType, nullable = false)(),
    AttributeReference("files_added", LongType, nullable = false)(),
    AttributeReference("files_removed", LongType, nullable = false)(),
    AttributeReference("bytes_added", LongType, nullable = false)(),
    AttributeReference("bytes_removed", LongType, nullable = false)())

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
    // pre-op state for result metrics: removed-file bytes come from the
    // PRE-op live set (commit removes carry paths only) — metadata-only
    val before = t.log.latestId.getOrElse(-1L)
    val bytesByPath = t.log.liveFiles().map(f => f.path -> f.bytes).toMap
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
      if (t.config.clusterCols.nonEmpty)
        ("recluster", t.recluster(pruneBy,
          maxPartitionsPerCommit = GraftOptimizeCommand.PartitionsPerCommit))
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
        ("compact_small", t.compactSmall(
          maxPartitionsPerCommit = GraftOptimizeCommand.PartitionsPerCommit))
      }
    // result metrics (the Delta OPTIMIZE-report role): aggregated over
    // every commit this statement published (bounded batching may emit
    // several) — zero row when nothing to do
    val reorgOps = Set("recluster", "delta_compact", "compact")
    val mine =
      if (cid == before) Seq.empty
      else t.log.commits.filter(c => c.id > before && c.id <= cid &&
        reorgOps.contains(c.op))
    val (fa, fr, ba, br) = mine.foldLeft((0L, 0L, 0L, 0L)) { (acc, c) =>
      (acc._1 + c.adds.size, acc._2 + c.removes.size,
        acc._3 + c.adds.map(_.bytes).sum,
        acc._4 + c.removes.flatMap(bytesByPath.get).sum)
    }
    Seq(Row(op, cid, fa, fr, ba, br))
  }
}

private[sql] object GraftOptimizeCommand {
  /** partitions rewritten per OPTIMIZE commit — bounds every OCC window
    * and makes a deep backlog drain with partial progress (a crash
    * forfeits one batch, never the run); Delta batches its OPTIMIZE
    * commits for the same reason */
  val PartitionsPerCommit = 64
}

/** `DESCRIBE DETAIL t` — one metadata-only row summarizing the table's
  * physical state (Delta's spelling): layout, live file/byte counts,
  * deletion-vector load, timeline extent, declared clustering, stats
  * and materialized-view freshness. Everything comes from the commit
  * log and descriptors — NO data scan, so it is as cheap on 100 TB as
  * on 100 rows. */
private[sql] final case class GraftDescribeDetailCommand(
    catName: String, ns: Seq[String], name: String)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("format", StringType, nullable = false)(),
    AttributeReference("location", StringType, nullable = false)(),
    AttributeReference("storage_type", StringType, nullable = false)(),
    AttributeReference("num_files", LongType, nullable = false)(),
    AttributeReference("num_delta_files", LongType, nullable = false)(),
    AttributeReference("num_dv_files", LongType, nullable = false)(),
    AttributeReference("dv_positions", LongType, nullable = false)(),
    AttributeReference("size_bytes", LongType, nullable = false)(),
    AttributeReference("num_rows", LongType, nullable = false)(),
    AttributeReference("head_commit", LongType, nullable = false)(),
    AttributeReference("num_commits", LongType, nullable = false)(),
    AttributeReference("cleaned_up_to", LongType, nullable = false)(),
    AttributeReference("key_cols", StringType, nullable = false)(),
    AttributeReference("partition_cols", StringType, nullable = false)(),
    AttributeReference("cluster_cols", StringType, nullable = false)(),
    AttributeReference("stats_commit", LongType, nullable = true)(),
    AttributeReference("num_mat_views", LongType, nullable = false)(),
    AttributeReference("stale_mat_views", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val cat = ViewResolution.graftCatalog(session, catName).getOrElse(
      throw new IllegalArgumentException(s"catalog $catName is not a graft catalog"))
    val root = cat.tableRoot(ns, name)
    val hconf = session.sparkContext.hadoopConfiguration
    val desc = graft.lake.TableDescriptor.load(root, hconf).getOrElse(
      throw new AnalysisException("TABLE_OR_VIEW_NOT_FOUND", Map(
        "relationName" -> s"`$catName`.`${(ns :+ name).mkString("`.`")}`")))
    val t = graft.lake.LakeTable(session, desc.config(root))
    val live = if (t.exists) t.log.liveFiles() else Seq.empty
    val dvs = if (t.exists) t.log.liveDvs() else Seq.empty
    val (base, deltas) = live.partition(!_.isDelta)
    val head = t.log.latestId.getOrElse(-1L)
    // exact row count from commit metadata via the strict prover behind
    // the SQL COUNT pushdown (footer counts minus live DV positions);
    // -1 when the proof needs a scan (pending MoR deltas, pre-upgrade
    // footers) — DESCRIBE DETAIL never scans data
    val rowsExact =
      if (!t.exists) 0L else t.metadataRowCount().getOrElse(-1L)
    val mvRoots = Option(desc.matViews).getOrElse(Seq.empty)
    val mvStates = mvRoots.flatMap { r =>
      for {
        d <- graft.lake.TableDescriptor.load(r, hconf)
        mv <- Option(d.matView)
        if mv.source == root
      } yield scala.util.Try(
        graft.lake.MaterializedAgg.fromDescriptor(session, t, r, mv).fresh)
        .getOrElse(false)
    }
    val stats = graft.lake.ColStats.load(root, hconf)
    Seq(Row("graft", root, desc.storageType,
      base.size.toLong, deltas.size.toLong, dvs.size.toLong,
      dvs.map(_.rows).sum, live.map(_.bytes).sum, rowsExact,
      head, t.log.commits.size.toLong, t.log.cleanedUpTo,
      desc.keyCols.mkString(","), desc.partitionCols.mkString(","),
      Option(desc.clusterCols).getOrElse(Seq.empty).mkString(","),
      stats.map(s => java.lang.Long.valueOf(s.commit)).orNull,
      mvStates.size.toLong, mvStates.count(!_).toLong))
  }
}

/** `DESCRIBE HISTORY t` — the Delta spelling of the `.history`
  * metadata table: one metadata-only row per retained commit, newest
  * first (Delta's ordering). Commit-log only — no data scan. */
private[sql] final case class GraftDescribeHistoryCommand(
    catName: String, ns: Seq[String], name: String)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("timestamp", org.apache.spark.sql.types.TimestampType,
      nullable = false)(),
    AttributeReference("operation", StringType, nullable = false)(),
    AttributeReference("n_files_added", LongType, nullable = false)(),
    AttributeReference("n_files_removed", LongType, nullable = false)(),
    AttributeReference("bytes_added", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val cat = ViewResolution.graftCatalog(session, catName).getOrElse(
      throw new IllegalArgumentException(s"catalog $catName is not a graft catalog"))
    val root = cat.tableRoot(ns, name)
    val desc = graft.lake.TableDescriptor.load(root,
      session.sparkContext.hadoopConfiguration).getOrElse(
      throw new AnalysisException("TABLE_OR_VIEW_NOT_FOUND", Map(
        "relationName" -> s"`$catName`.`${(ns :+ name).mkString("`.`")}`")))
    val t = graft.lake.LakeTable(session, desc.config(root))
    if (!t.exists) return Seq.empty
    t.log.commitsAll.sortBy(-_.id).map(c => Row(c.id,
      java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(c.tsMillis)),
      c.op, c.adds.size.toLong, c.removes.size.toLong,
      c.adds.map(_.bytes).sum))
  }
}

/** `COPY INTO t FROM '<dir>' [FILEFORMAT = PARQUET|JSON|CSV|ORC]
  * [PATTERN = '<glob>'] [FORMAT_OPTIONS('k' = 'v', ...)]` — Delta's
  * idempotent file-loading spelling. FORMAT_OPTIONS pass through to the
  * reader verbatim (delimiter, mergeSchema, timestampFormat, ...).
  *
  * Idempotence: every successfully loaded source file leaves a marker
  * (`_log/_copy/<sha1(path)>`) and is SKIPPED by later COPYs, so a
  * scheduled re-run over a landing directory ingests only new arrivals.
  * The marker is written after the load commit publishes; a crash in
  * between re-loads those files on retry, which is harmless because the
  * load rides the table's precombine UPSERT — re-ingesting identical
  * rows is a no-op by the write semantics themselves, so the
  * marker+upsert pair is exactly-once EFFECTIVE without a transactional
  * marker. Past [[GraftCopyIntoCommand.CompactMarkersAt]] markers the
  * directory folds into ONE manifest file (`_log/_copy/_manifest`, one
  * hash per line; markers delete only after the manifest persists, and
  * duplicate entries are harmless set members) — so the per-COPY
  * listing stays O(1) files at ingest scale instead of one marker per
  * file ever loaded. Cost at 100 TB: one manifest read + one small
  * marker listing per COPY + a scan of only the NEW files; `rows_loaded`
  * comes from the load commit's own add/remove metadata (footer-exact),
  * never a second scan of the staged files. */
private[sql] final case class GraftCopyIntoCommand(
    catName: String, ns: Seq[String], name: String,
    srcDir: String, fileFormat: String, pattern: Option[String],
    options: Map[String, String] = Map.empty,
    /** explicit file list (`FILES = ('a.parquet', ...)`) — names
      * resolve against the FROM dir unless absolute; mutually
      * exclusive with PATTERN; a named file that does not exist fails
      * loud (an explicit list is a manifest, not a glob) */
    files: Seq[String] = Seq.empty)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("files_loaded", LongType, nullable = false)(),
    AttributeReference("files_skipped", LongType, nullable = false)(),
    AttributeReference("rows_loaded", LongType, nullable = false)(),
    AttributeReference("commit", LongType, nullable = false)())

  private def sha1(s: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-1")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  override def run(session: SparkSession): Seq[Row] = {
    // COPY INTO does not enlist in the session transaction (its marker
    // protocol is its own idempotence mechanism, written after the load
    // commit publishes) — running it inside one would SILENTLY publish
    // while the user's other writes stay staged, so refuse loud
    require(GraftSessionTxn.current(session).isEmpty,
      "COPY INTO inside an open transaction is not supported — COMMIT or " +
        "ROLLBACK first (the load is idempotent on its own: re-running " +
        "skips already-loaded files)")
    val cat = ViewResolution.graftCatalog(session, catName).getOrElse(
      throw new IllegalArgumentException(s"catalog $catName is not a graft catalog"))
    val root = cat.tableRoot(ns, name)
    val hconf = session.sparkContext.hadoopConfiguration
    val desc = graft.lake.TableDescriptor.load(root, hconf).getOrElse(
      throw new AnalysisException("TABLE_OR_VIEW_NOT_FOUND", Map(
        "relationName" -> s"`$catName`.`${(ns :+ name).mkString("`.`")}`")))
    val t = graft.lake.LakeTable(session, desc.config(root))
    val src = new org.apache.hadoop.fs.Path(srcDir)
    val fs = src.getFileSystem(hconf)
    val candidates =
      if (files.nonEmpty) files.toArray.map { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        val full = if (p.isAbsolute) p else new org.apache.hadoop.fs.Path(src, f)
        require(fs.isFile(full),
          s"COPY INTO FILES names a missing file: $full")
        fs.getFileStatus(full)
      }
      else (pattern match {
        case Some(g) => fs.globStatus(new org.apache.hadoop.fs.Path(src, g))
        case None if fs.isDirectory(src) => fs.listStatus(src)
        case None => fs.globStatus(src)
      }) match {
        case null => Array.empty[org.apache.hadoop.fs.FileStatus]
        case a => a.filter(st => st.isFile &&
          !st.getPath.getName.startsWith(".") &&
          !st.getPath.getName.startsWith("_"))
      }
    val markerDir = new org.apache.hadoop.fs.Path(root, "_log/_copy")
    val manifest = new org.apache.hadoop.fs.Path(markerDir, "_manifest")
    val markers: Seq[org.apache.hadoop.fs.FileStatus] =
      if (!fs.exists(markerDir)) Seq.empty
      else fs.listStatus(markerDir).toSeq
        .filterNot(_.getPath.getName.startsWith("_"))
    val manifested: Set[String] =
      if (!fs.exists(manifest)) Set.empty
      else {
        val in = fs.open(manifest)
        try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().map(_.trim).filter(_.nonEmpty).toSet
        finally in.close()
      }
    val loaded: Set[String] =
      manifested ++ markers.map(_.getPath.getName)
    val fresh = candidates.filterNot(st =>
      loaded.contains(sha1(st.getPath.toString)))
    if (fresh.isEmpty)
      return Seq(Row(0L, candidates.length.toLong, 0L,
        t.log.latestId.getOrElse(-1L)))
    val fmt = Option(fileFormat).map(_.toLowerCase).getOrElse("parquet")
    require(Set("parquet", "json", "csv", "orc").contains(fmt),
      s"unsupported FILEFORMAT '$fileFormat' (parquet, json, csv, orc)")
    val reader = session.read.format(fmt).options(options)
    val df0 = (if (fmt == "csv" && !options.keys.exists(_.equalsIgnoreCase("header")))
        reader.option("header", "true") else reader)
      .load(fresh.map(_.getPath.toString).toIndexedSeq: _*)
    // align by NAME to the table's user schema, loud on a missing column
    val full = {
      val s = t.tableSchema()
      if (s.fields.nonEmpty) s
      else Option(desc.schemaJson).filter(_.nonEmpty)
        .map(j => org.apache.spark.sql.types.DataType.fromJson(j)
          .asInstanceOf[org.apache.spark.sql.types.StructType])
        .getOrElse(new org.apache.spark.sql.types.StructType())
    }
    val userFields = full.fields.toSeq
      .filterNot(f => graft.lake.SchemaEvo.isInternal(f.name))
    val df = df0.select(userFields.map(f =>
      org.apache.spark.sql.functions.col(f.name).cast(f.dataType)): _*)
    // rows_loaded from the load commit's OWN metadata — the staged files
    // are scanned exactly once (by the upsert itself). Adds carry
    // footer-exact row counts; on CoW a rewritten file group carries its
    // surviving old rows too, so subtract the removed files' counts:
    // the result is the commit's NET row delta (= staged rows for the
    // canonical fresh-file load; updated-in-place rows count net zero).
    val preRows =
      if (t.exists) t.log.liveFiles().map(f => f.path -> f.rows).toMap
      else Map.empty[String, Long]
    val cid = t.upsert(df)
    val rows = t.log.commits.filter(_.id == cid).map(c =>
      c.adds.map(_.rows).sum - c.removes.flatMap(preRows.get).sum).sum
    fs.mkdirs(markerDir)
    fresh.foreach { st =>
      val out = fs.create(new org.apache.hadoop.fs.Path(markerDir,
        sha1(st.getPath.toString)), true)
      try out.write(st.getPath.toString.getBytes("UTF-8")) finally out.close()
    }
    // marker compaction: past the threshold, fold manifest + markers
    // into one rewritten manifest (temp + rename), THEN delete markers —
    // a crash in between leaves both sources listing the same hashes,
    // which the union read above treats as one set
    val allMarkers = fs.listStatus(markerDir).toSeq
      .filterNot(_.getPath.getName.startsWith("_"))
    if (allMarkers.size > GraftCopyIntoCommand.CompactMarkersAt) {
      val merged = (manifested ++ allMarkers.map(_.getPath.getName)).toSeq.sorted
      val tmp = new org.apache.hadoop.fs.Path(markerDir, "_manifest.tmp")
      val out = fs.create(tmp, true)
      try out.write(merged.mkString("\n").getBytes("UTF-8")) finally out.close()
      if (fs.exists(manifest)) fs.delete(manifest, false)
      fs.rename(tmp, manifest)
      allMarkers.foreach(st => fs.delete(st.getPath, false))
    }
    Seq(Row(fresh.length.toLong, (candidates.length - fresh.length).toLong,
      rows, cid))
  }
}

private[graft] object GraftCopyIntoCommand {
  /** marker-dir size that triggers folding into the single manifest —
    * bounds the per-COPY listing at ingest scale (one manifest read +
    * at most this many marker statuses) */
  val CompactMarkersAt = 256
}

/** `CREATE TABLE dst SHALLOW|DEEP CLONE src [VERSION AS OF n]` — the
  * Delta spellings of `CALL graft.system.clone`. SHALLOW is the
  * zero-copy metadata clone (the clone's commits reference the
  * source's files by absolute path; physical maintenance only ever
  * deletes OWNED files, so neither table can corrupt the other). DEEP
  * physically copies the snapshot into the clone's own storage
  * ([[graft.lake.LakeTable.deepClone]]: byte-copy fast path on clean
  * snapshots, merged rewrite under deltas/DVs) — full storage
  * independence, e.g. before VACUUMing the source to the bone. Both
  * identifiers must land in the same graft catalog. */
private[sql] final case class GraftCloneCommand(
    catName: String, dstNs: Seq[String], dstName: String,
    srcParts: Seq[String], version: Option[Long], ifNotExists: Boolean,
    deep: Boolean = false)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("cloned_commit", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val cat = ViewResolution.graftCatalog(session, catName).getOrElse(
      throw new IllegalArgumentException(s"catalog $catName is not a graft catalog"))
    val src = ViewResolution.resolve(session, srcParts).getOrElse(
      throw new AnalysisException("TABLE_OR_VIEW_NOT_FOUND", Map(
        "relationName" -> srcParts.mkString("."))))
    require(src._1.name == catName,
      s"SHALLOW CLONE source must live in the same graft catalog " +
        s"($catName), got ${src._1.name}")
    val dstIdent = org.apache.spark.sql.connector.catalog.Identifier
      .of(dstNs.toArray, dstName)
    if (ifNotExists && cat.tableExists(dstIdent)) return Seq(Row(-1L))
    val cid = cat.cloneTable((src._2 :+ src._3).mkString("."),
      (dstNs :+ dstName).mkString("."), version, deep)
    Seq(Row(cid))
  }
}

/** `RESTORE TABLE t TO VERSION AS OF n` / `... TO TIMESTAMP AS OF
  * '<ts>'` — the Delta spellings of `CALL graft.system.restore`: roll
  * the timeline back to commit `n` (later commits retire; time travel
  * ABOVE the restore point keeps working until cleaned). The timestamp
  * form resolves to the last commit stamped at or before the given
  * wall-clock instant (parsed in the SESSION time zone, same as
  * `TIMESTAMP AS OF` reads) — filter, not takeWhile: per-writer clocks
  * carry no monotonicity guarantee. */
private[sql] final case class GraftRestoreCommand(
    catName: String, ns: Seq[String], name: String,
    version: Option[Long], timestamp: Option[String] = None)
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
    val target = version.getOrElse {
      val ts = timestamp.getOrElse(throw new IllegalArgumentException(
        "RESTORE needs VERSION AS OF or TIMESTAMP AS OF"))
      // session-zone parse through Spark's own cast, loud on garbage
      val millis = Option(session.sql(
        s"SELECT unix_millis(CAST('${ts.replace("'", "''")}' AS TIMESTAMP))")
        .collect().head).filterNot(_.isNullAt(0)).map(_.getLong(0))
        .getOrElse(throw new IllegalArgumentException(
          s"cannot parse RESTORE timestamp '$ts'"))
      t.log.commits.filter(_.tsMillis <= millis).lastOption
        .map(_.id).getOrElse(throw new IllegalArgumentException(
          s"no commit at or before '$ts' on $catName.${(ns :+ name).mkString(".")}"))
    }
    t.restoreTo(target)
    Seq(Row(target))
  }
}

/** `VACUUM t [RETAIN n HOURS] [DRY RUN]` — DRY RUN (Delta's spelling)
  * LISTS the exact victims (superseded data files + orphaned crash
  * directories) without touching anything: one row per path. The real
  * run consumes the same plan ([[graft.lake.CommitLog.cleanPlan]]), so
  * preview and apply can only diverge by commits landing in between. */
private[sql] final case class GraftVacuumCommand(
    catName: String, ns: Seq[String], name: String,
    retainHours: Option[Long], dryRun: Boolean = false)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    if (dryRun) Seq(
      AttributeReference("path", StringType, nullable = false)(),
      AttributeReference("kind", StringType, nullable = false)())
    else Seq(
      AttributeReference("cleaned_up_to", LongType, nullable = false)(),
      AttributeReference("files_deleted", LongType, nullable = false)(),
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
    if (dryRun) {
      t.cleanOlderThanPlan(ms).map(p => Row(p, "superseded")) ++
        t.vacuumOrphans(ms, dryRun = true).map(p => Row(p, "orphan"))
    } else {
      val deleted = t.cleanOlderThan(ms)
      val orphans = t.vacuumOrphans(ms)
      Seq(Row(t.log.cleanedUpTo, deleted.toLong, orphans.size.toLong))
    }
  }
}
