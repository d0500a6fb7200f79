package graft.sql

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.lake.TableDescriptor

/** DSv2 catalog plugin for lake tables — the idiomatic Spark-4 SQL
  * surface over [[graft.lake.LakeTable]] (the reference's own read path
  * is catalog SQL, `glue/MockCuratedGlueJob.py:17-19`; its writes are
  * option-configured per job, `glue/HudiJarGlueJob.py:80-85` — here the
  * table identity/config persists with the table and SQL drives it):
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft", "graft.sql.GraftCatalog")
  *   spark.conf.set("spark.sql.catalog.graft.warehouse", "/data/wh")
  *   spark.sql("CREATE TABLE graft.db.t (pk BIGINT, ts INT, v STRING)
  *              PARTITIONED BY (region) TBLPROPERTIES
  *              (keyCols='pk', precombineCol='ts')")
  *   spark.sql("INSERT INTO graft.db.t SELECT ...")        // upsert
  *   spark.sql("DELETE FROM graft.db.t WHERE pk < 0")
  *   spark.sql("UPDATE graft.db.t SET v = 'x' WHERE ...")
  *   spark.sql("MERGE INTO graft.db.t USING src ON ...")
  *   spark.sql("SELECT * FROM graft.db.t VERSION AS OF 2") // time travel
  * }}}
  *
  * Layout: `<warehouse>/<namespace...>/<table>` — each table root holds
  * its own commit log plus a persisted [[TableDescriptor]], so the
  * catalog itself is stateless (any session pointing a catalog at the
  * warehouse sees the same tables; the metadata transaction story is the
  * commit log's, not the catalog's).
  */
final class GraftCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog with StagingTableCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  private def spark: SparkSession = SparkSession.active
  private def hconf = spark.sparkContext.hadoopConfiguration
  private def fs = new Path(warehouse).getFileSystem(hconf)

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name requires spark.sql.catalog.$name.warehouse"))
  }

  override def name(): String = catalogName

  /** warehouse root — the view store and MV commands resolve their
    * persistence paths from it */
  private[sql] def warehousePath: String = warehouse

  /** table root path for parser-level commands */
  private[sql] def tableRoot(ns: Seq[String], name: String): String =
    tablePath(Identifier.of(ns.toArray, name)).toString

  /** SQL DEFAULT column values (`CREATE TABLE t (c INT DEFAULT 5)`):
    * declaring the capability makes Spark validate the expression at
    * CREATE, embed it as field metadata in the schema we persist, and
    * fill omitted columns / the DEFAULT keyword at INSERT analysis —
    * the engine only has to keep the metadata visible on the table
    * schema ([[GraftTableV2.schema]] overlays it from the declared
    * schema, since commit-recorded schemas carry the batch's plain
    * fields). `ALTER TABLE ... ADD COLUMN c INT DEFAULT 5` works too:
    * the constant rides the schema commit's field metadata (evolution
    * preserves kept fields' metadata), reads BACKFILL it for files that
    * predate the column (SchemaEvo's exists-default rule — batch and
    * stream surfaces share it), and INSERT analysis fills it forward.
    * `ALTER COLUMN c SET/DROP DEFAULT` edits the declaration for FUTURE
    * inserts (existing rows and exists-backfill untouched). Only
    * nested-field defaults refuse. */
  override def capabilities(): util.Set[TableCatalogCapability] =
    util.EnumSet.of(TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE,
      // generated + identity columns (Delta-parity DDL): Spark
      // validates the declarations at CREATE and embeds them as field
      // metadata; FILLING them is the engine's job — GraftDmlRule
      // rewrites graft-table inserts to compute generated columns and
      // assign identity values (see GraftFillComputedColumns)
      TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS,
      TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_IDENTITY_COLUMNS,
      // ANSI constraint DDL: CHECK constraints map onto the engine's
      // enforced per-write predicates (TBLPROPERTIES 'checks' parity),
      // PRIMARY KEY declares the record key (keyCols), both extracted
      // in createTable(TableInfo); UNIQUE/FOREIGN KEY refuse loudly
      // (nothing in the engine enforces them — accepting informational
      // constraints silently would misrepresent the contract)
      TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT)

  // path traversal guard: identifiers become directory names. Leading
  // dots are rejected because hidden (dot-prefixed) directories are the
  // catalog's private staging namespace (`.t.stage-*` / `.t.trash-*`) —
  // a user table named ".x" could collide with or shadow them.
  private def seg(s: String): String = {
    require(s.nonEmpty && !s.startsWith(".") && !s.exists(c => c == '/' || c == '\\'),
      s"illegal identifier segment '$s'")
    s
  }

  private def nsPath(ns: Array[String]): Path =
    ns.foldLeft(new Path(warehouse))((p, s) => new Path(p, seg(s)))

  private def tablePath(ident: Identifier): Path =
    new Path(nsPath(ident.namespace), seg(ident.name))

  private def isTableDir(p: Path): Boolean =
    TableDescriptor.exists(p.toString, hconf)

  // ---- tables ----------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = nsPath(namespace)
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(namespace)
    // finish any crashed REPLACE rollback first, so a table whose root is
    // momentarily in a trash dir still appears in the listing
    fs.listStatus(dir).toSeq.map(_.getPath.getName).foreach {
      case GraftCatalog.HiddenDir(tbl, "trash") =>
        maybeRecover(Identifier.of(namespace, tbl)); ()
      case _ => ()
    }
    fs.listStatus(dir).toSeq.filter(_.isDirectory)
      .filter(s => !s.getPath.getName.startsWith(".") && isTableDir(s.getPath))
      .map(s => Identifier.of(namespace, s.getPath.getName)).toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    isTableDir(tablePath(ident)) || maybeRecover(ident)

  /** Crashed-REPLACE recovery: a REPLACE publish that died between its
    * two renames leaves the root missing and the ORIGINAL table complete
    * in a hidden `.name.trash-<uuid>` sibling. Restore it (the staged
    * replacement never reached the root, so the REPLACE simply never
    * happened — the advertised contract). Returns whether the table is
    * present afterwards. Cheap in the common case: only consulted when
    * the root has no descriptor. */
  private def maybeRecover(ident: Identifier): Boolean =
    GraftCatalog.publishLock.synchronized {
      val root = tablePath(ident)
      if (isTableDir(root)) true
      else {
        val ns = nsPath(ident.namespace)
        val prefix = s".${ident.name}.trash-"
        if (!fs.exists(ns)) false
        else fs.listStatus(ns).toSeq
          .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix) &&
            isTableDir(s.getPath))
          .sortBy(-_.getModificationTime).headOption.exists { t =>
            if (fs.exists(root)) fs.delete(root, true) // partial remnant
            fs.rename(t.getPath, root)
          }
      }
    }

  private def descriptorOf(ident: Identifier): TableDescriptor = {
    val root = tablePath(ident)
    val desc = TableDescriptor.load(root.toString, hconf)
      .orElse {
        if (maybeRecover(ident)) TableDescriptor.load(root.toString, hconf) else None
      }
      .getOrElse(throw new NoSuchTableException(ident))
    healRelocation(root)
    desc
  }

  /** finish a crashed RENAME's path relocation: the marker written
    * before the directory rename names the OLD root; rewriting is
    * CONVERGENT (paths already under the new root no longer match the
    * old prefix), so re-running it heals any partial state. The marker
    * is deleted only after a complete pass. One fs.exists per table
    * load — the same metadata round-trip class as the descriptor read. */
  private def healRelocation(root: Path): Unit = {
    val marker = new Path(root, "_log/_relocate")
    if (fs.exists(marker)) GraftCatalog.publishLock.synchronized {
      if (fs.exists(marker)) {
        val in = fs.open(marker)
        val oldRoot =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        if (oldRoot.nonEmpty && oldRoot != root.toString)
          new graft.lake.CommitLog(root.toString, hconf).relocateFrom(oldRoot)
        fs.delete(marker, false)
      }
    }
  }

  override def loadTable(ident: Identifier): Table = {
    // metadata-table suffix (Iceberg surface: `db.t.history` etc.) —
    // resolved ONLY when the full identifier names no stored table, so
    // a real table called "history" always wins
    if (!tableExists(ident) && ident.namespace().length >= 2 &&
        (GraftMetaTable.kinds.contains(ident.name()) || ident.name() == "ro")) {
      val parent = Identifier.of(
        ident.namespace().init, ident.namespace().last)
      if (tableExists(parent)) {
        val desc = descriptorOf(parent)
        val root = tablePath(parent).toString
        // `db.t.ro` — Hudi's read-optimized MoR view: a full table scan
        // surface (pruning, stats, V1 relation) over BASE files only
        if (ident.name() == "ro")
          return new GraftTableV2(spark, catalogName, ident.toString,
            root, desc, asOf = None, readOptimized = true)
        val lake = graft.lake.LakeTable(spark, desc.config(root))
        return new GraftMetaTable(ident.toString,
          () => GraftMetaTable.kinds(ident.name())(lake))
      }
    }
    // metadata tables COMPOSE on branch identifiers:
    // `db.t.branch_<name>.history/.files/.partitions/.tags` reads the
    // BRANCH's own timeline (same shadowing rule: any real table wins)
    if (!tableExists(ident) && ident.namespace().length >= 3 &&
        GraftMetaTable.kinds.contains(ident.name())) {
      val ns = ident.namespace()
      val bseg = ns.last
      if (bseg.startsWith("branch_") && bseg.length > "branch_".length) {
        val gparent = Identifier.of(ns.init.init, ns.init.last)
        if (tableExists(gparent)) {
          val desc = descriptorOf(gparent)
          val br = graft.lake.LakeTable(
              spark, desc.config(tablePath(gparent).toString))
            .branch(bseg.stripPrefix("branch_"))
          return new GraftMetaTable(ident.toString,
            () => GraftMetaTable.kinds(ident.name())(br))
        }
      }
    }
    // branch suffix (Iceberg's `db.t.branch_<name>` identifier): a FULL
    // read/write table over the branch's own timeline — same shadowing
    // rule as the metadata suffixes (a real table always wins)
    if (!tableExists(ident) && ident.namespace().length >= 2 &&
        ident.name().startsWith("branch_") &&
        ident.name().length > "branch_".length) {
      val parent = Identifier.of(
        ident.namespace().init, ident.namespace().last)
      if (tableExists(parent)) {
        val desc = descriptorOf(parent)
        val root = tablePath(parent).toString
        val br = graft.lake.LakeTable(spark, desc.config(root))
          .branch(ident.name().stripPrefix("branch_"))
        return new GraftTableV2(spark, catalogName, ident.toString,
          br.config.root, desc, asOf = None)
      }
    }
    val desc = descriptorOf(ident)
    val root = tablePath(ident)
    new GraftTableV2(spark, catalogName, ident.toString, root.toString, desc, asOf = None)
  }

  /** `VERSION AS OF <commit>` time travel (Delta/Hudi syntax). */
  override def loadTable(ident: Identifier, version: String): Table = {
    // time travel composes with the branch identifier: the pin resolves
    // on the BRANCH's own timeline (commit ids or its tags)
    if (!tableExists(ident) && ident.namespace().length >= 2 &&
        ident.name().startsWith("branch_") &&
        ident.name().length > "branch_".length) {
      val parent = Identifier.of(
        ident.namespace().init, ident.namespace().last)
      if (tableExists(parent)) {
        val desc = descriptorOf(parent)
        val br = graft.lake.LakeTable(
            spark, desc.config(tablePath(parent).toString))
          .branch(ident.name().stripPrefix("branch_"))
        val pinned = version.toLongOption.getOrElse(br.resolveTag(version))
        return new GraftTableV2(spark, catalogName, ident.toString,
          br.config.root, desc, asOf = Some(pinned))
      }
    }
    val desc = descriptorOf(ident)
    val root = tablePath(ident)
    // numeric = commit id; otherwise a TAG name resolved on the table's
    // commit log (tag names cannot be bare numbers — enforced at create)
    val pinned = version.toLongOption.getOrElse {
      graft.lake.LakeTable(spark, desc.config(root.toString))
        .resolveTag(version)
    }
    new GraftTableV2(spark, catalogName, ident.toString, root.toString, desc, asOf = Some(pinned))
  }

  /** `TIMESTAMP AS OF` — resolves to the last commit at or before the
    * timestamp (microseconds since epoch, per the DSv2 contract). */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val desc = descriptorOf(ident)
    val root = tablePath(ident)
    val t = graft.lake.LakeTable(spark, desc.config(root.toString))
    // filter, not takeWhile: commit timestamps come from per-writer wall
    // clocks with no monotonicity guarantee — one early-clock commit
    // must not hide all later qualifying ones
    val id = t.log.commits.filter(_.tsMillis <= timestamp / 1000L)
      .lastOption.map(_.id).getOrElse(throw new IllegalArgumentException(
        s"no commit at or before timestamp $timestamp on $ident"))
    new GraftTableV2(spark, catalogName, ident.toString, root.toString, desc, asOf = Some(id))
  }

  override def createTable(
      ident: Identifier, schema: StructType, partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val desc = buildDescriptor(schema, partitions, properties)
    TableDescriptor.save(tablePath(ident).toString, desc, hconf)
    new GraftTableV2(spark, catalogName, ident.toString, tablePath(ident).toString, desc, None)
  }

  /** GENERATED AS (expr) / AS IDENTITY declarations only travel through
    * the Column-based create API (the StructType back-compat conversion
    * drops them), so the TableInfo overload is the one Spark's
    * CreateTableExec actually calls — extract the declarations here,
    * persist them as first-class descriptor facts AND as field metadata
    * in schemaJson (the [[GraftTableV2.schema]] overlay re-exposes them
    * on every later load for DESCRIBE/analysis). */
  override def createTable(ident: Identifier,
      info: org.apache.spark.sql.connector.catalog.TableInfo): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val schema = info.schema()
    val identityCols = info.columns().flatMap { c =>
      Option(c.identityColumnSpec()).map { s =>
        require(c.dataType() == org.apache.spark.sql.types.LongType ||
            c.dataType() == org.apache.spark.sql.types.IntegerType ||
            c.dataType() == org.apache.spark.sql.types.ShortType,
          s"identity column '${c.name}' must be integral, got ${c.dataType.simpleString}")
        c.name -> s"${s.getStart}:${s.getStep}:${s.isAllowExplicitInsert}"
      }
    }.toMap
    val generatedCols = info.columns().flatMap { c =>
      Option(c.generationExpression()).map(c.name -> _)
    }.toMap
    generatedCols.foreach { case (c, ex) =>
      val refs = spark.sessionState.sqlParser.parseExpression(ex).collect {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          a.nameParts.last.toLowerCase
      }.toSet
      val derived = (generatedCols.keySet ++ identityCols.keySet).map(_.toLowerCase)
      val badRefs = refs & derived
      require(badRefs.isEmpty,
        s"generated column '$c' may not reference other generated/identity " +
          s"columns: ${badRefs.mkString(",")}")
    }
    // re-embed the declarations as field metadata so schemaJson carries
    // them (the StructType conversion dropped them)
    import org.apache.spark.sql.catalyst.util.{GeneratedColumn, IdentityColumn}
    val schemaWithMeta = StructType(schema.fields.map { f =>
      val mb = new org.apache.spark.sql.types.MetadataBuilder()
        .withMetadata(f.metadata)
      identityCols.get(f.name).foreach { s =>
        val Array(st, sp, ae) = s.split(':')
        mb.putLong(IdentityColumn.IDENTITY_INFO_START, st.toLong)
        mb.putLong(IdentityColumn.IDENTITY_INFO_STEP, sp.toLong)
        mb.putBoolean(IdentityColumn.IDENTITY_INFO_ALLOW_EXPLICIT_INSERT, ae.toBoolean)
      }
      generatedCols.get(f.name).foreach(ex =>
        mb.putString(GeneratedColumn.GENERATION_EXPRESSION_METADATA_KEY, ex))
      f.copy(metadata = mb.build())
    })
    // ANSI constraints: CHECK → enforced per-write predicate (merged
    // with the TBLPROPERTIES 'checks' spelling — duplicate names
    // refuse); PRIMARY KEY → the record key (keyCols), which the engine
    // genuinely enforces through upsert identity. UNIQUE/FK refuse.
    val constraintChecks = info.constraints().collect {
      case c: org.apache.spark.sql.connector.catalog.constraints.Check =>
        c.name.toLowerCase -> c.predicateSql()
    }.toMap
    val pkCols = info.constraints().collect {
      case pk: org.apache.spark.sql.connector.catalog.constraints.PrimaryKey =>
        pk.columns().map(_.fieldNames.mkString(".")).toSeq
    }
    info.constraints().foreach {
      case _: org.apache.spark.sql.connector.catalog.constraints.Unique |
           _: org.apache.spark.sql.connector.catalog.constraints.ForeignKey =>
        throw new UnsupportedOperationException(
          "UNIQUE and FOREIGN KEY constraints are not enforced by this " +
            "engine and are therefore not accepted (PRIMARY KEY and CHECK are)")
      case _ => ()
    }
    require(pkCols.size <= 1, "at most one PRIMARY KEY constraint")
    // PRIMARY KEY may DECLARE the key (keyCols property then optional);
    // when both appear they must agree
    val props = new java.util.HashMap[String, String](info.properties())
    pkCols.headOption.foreach { pk =>
      Option(props.get("keyCols")).foreach(kc => require(
        kc.split(",").map(_.trim).filter(_.nonEmpty).toSeq == pk,
        s"PRIMARY KEY (${pk.mkString(",")}) and TBLPROPERTIES keyCols='$kc' disagree"))
      props.put("keyCols", pk.mkString(","))
    }
    val desc0 = buildDescriptor(schemaWithMeta, info.partitions(), props)
    val dup = constraintChecks.keySet & desc0.checks.keySet
    require(dup.isEmpty,
      s"CHECK constraint name(s) collide with TBLPROPERTIES checks: ${dup.mkString(",")}")
    val desc = desc0
      .copy(identityCols = identityCols, generatedCols = generatedCols,
        checks = desc0.checks ++ constraintChecks,
        schemaJson = schemaWithMeta.json)
    TableDescriptor.save(tablePath(ident).toString, desc, hconf)
    new GraftTableV2(spark, catalogName, ident.toString,
      tablePath(ident).toString, desc, None)
  }

  /** validate + assemble the persisted table descriptor from a CREATE's
    * schema/partitioning/properties — shared by [[createTable]] and the
    * staged (CTAS / REPLACE TABLE) creation paths */
  /** the 'name1:expr1;name2:expr2' CHECK-constraints property — ONE
    * parser ([[ChecksProp.parse]]) for CREATE TABLE and ALTER TABLE so
    * the two statements can never drift to different syntaxes */
  private def parseChecksProp(v: String): Map[String, String] =
    ChecksProp.parse(v)

  private def buildDescriptor(
      schema: StructType, partitions: Array[Transform],
      properties: util.Map[String, String]): TableDescriptor = {
    val props = properties.asScala
    // accept both TBLPROPERTIES(k=...) and OPTIONS(k=...) spellings
    def prop(k: String): Option[String] =
      props.get(k).orElse(props.get(TableCatalog.OPTION_PREFIX + k))
    def csv(k: String): Seq[String] =
      prop(k).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(Seq.empty)
    // identity + the hidden-partitioning transform surface (Iceberg's
    // partition-spec transforms): PARTITIONED BY (months(ts),
    // bucket(16, id), truncate(4, code), …) — the source column stays a
    // normal data column; only directory naming and pruning change
    // (graft.lake.PartTransform)
    def intArg(t: Transform, what: String): Int =
      t.arguments.collectFirst {
        case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
          l.value.toString.toInt
      }.getOrElse(throw new IllegalArgumentException(
        s"${t.name} transform needs a literal $what: $t"))
    val (partitionCols, partitionTransformSpecs) = partitions.toSeq.map { t =>
      val ref = t.references.headOption
        .map(_.fieldNames.mkString("."))
        .getOrElse(throw new UnsupportedOperationException(
          s"partition transform references no column: $t"))
      t.name match {
        case "identity" => (ref, "identity")
        case n @ ("years" | "months" | "days" | "hours") => (ref, n)
        case "bucket" => (ref, s"bucket[${intArg(t, "bucket count")}]")
        case "truncate" => (ref, s"truncate[${intArg(t, "width")}]")
        case _ => throw new UnsupportedOperationException(
          s"unsupported partition transform: $t " +
            "(supported: identity, years, months, days, hours, " +
            "bucket(N, col), truncate(W, col))")
      }
    }.unzip
    val partitionTransforms =
      if (partitionTransformSpecs.forall(_ == "identity")) Seq.empty[String]
      else partitionTransformSpecs
    val keyCols = csv("keyCols")
    require(keyCols.nonEmpty,
      "CREATE TABLE ... USING graft requires TBLPROPERTIES (keyCols='...')")
    val precombine = prop("precombineCol").getOrElse(throw new IllegalArgumentException(
      "CREATE TABLE ... USING graft requires TBLPROPERTIES (precombineCol='...')"))
    (keyCols ++ partitionCols :+ precombine).foreach(c =>
      require(schema.fieldNames.contains(c),
        s"declared column '$c' is not in the table schema"))
    val checks = prop("checks").map(parseChecksProp)
      .getOrElse(Map.empty[String, String])
    // GENERATED ... AS declarations: Spark validated them at CREATE
    // (capabilities()) and embedded them as field metadata — lift them
    // into first-class descriptor facts so the WRITE path (LakeTable's
    // ingest fill) works from the descriptor alone
    val identityCols = schema.fields.flatMap { f =>
      org.apache.spark.sql.catalyst.util.IdentityColumn.getIdentityInfo(f)
        .map { spec =>
          require(f.dataType == org.apache.spark.sql.types.LongType ||
              f.dataType == org.apache.spark.sql.types.IntegerType ||
              f.dataType == org.apache.spark.sql.types.ShortType,
            s"identity column '${f.name}' must be integral, got ${f.dataType.simpleString}")
          f.name -> s"${spec.getStart}:${spec.getStep}:${spec.isAllowExplicitInsert}"
        }
    }.toMap
    val generatedCols = schema.fields.flatMap { f =>
      org.apache.spark.sql.catalyst.util.GeneratedColumn
        .getGenerationExpression(f).map(f.name -> _)
    }.toMap
    // a generated expression referencing another engine-derived column
    // would read its PRE-fill value — reject the ambiguity at CREATE
    generatedCols.foreach { case (c, ex) =>
      val refs = spark.sessionState.sqlParser.parseExpression(ex).collect {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          a.nameParts.last.toLowerCase
      }.toSet
      val derived = (generatedCols.keySet ++ identityCols.keySet).map(_.toLowerCase)
      val badRefs = refs & derived
      require(badRefs.isEmpty,
        s"generated column '$c' may not reference other generated/identity " +
          s"columns: ${badRefs.mkString(",")}")
    }
    TableDescriptor(
      identityCols = identityCols,
      generatedCols = generatedCols,
      keyCols = keyCols,
      precombineCol = precombine,
      partitionCols = partitionCols,
      globalIndex = prop("globalIndex").exists(_.toBoolean),
      storageType = prop("storageType").getOrElse("cow"),
      compactEvery = prop("compactEvery").map(_.toInt).getOrElse(0),
      occRetries = prop("occRetries").map(_.toInt).getOrElse(0),
      deleteMode = prop("deleteMode").getOrElse("rewrite"),
      updateMode = prop("updateMode").getOrElse("rewrite"),
      checkpointEvery = prop("checkpointEvery").map(_.toInt)
        .getOrElse(graft.lake.LakeTableConfig.DefaultCheckpointEvery),
      archiveOnClean = prop("archiveOnClean").exists(_.toBoolean),
      hashBuckets = prop("hashBuckets").map(_.toInt).getOrElse(0),
      statsCols = csv("statsCols"),
      clusterCols = csv("clusterCols"),
      zOrder = prop("zOrder").exists(_.toBoolean),
      bloomKeys = prop("bloomKeys").map(_.toInt).getOrElse(0),
      bloomCols = csv("bloomCols"),
      sumCols = csv("sumCols"),
      // ';'-separated (entries contain ':' and JSON-path dots):
      // col:$.path:type — validated by ShredSpec.parse inside the config
      shredPaths = prop("shredPaths").map(_.split(";").map(_.trim)
        .filter(_.nonEmpty).toSeq).getOrElse(Seq.empty),
      checks = checks,
      checkMode = {
        // validate HERE, not first at read time: an unvalidated persisted
        // descriptor would brick the table (every desc.config() throws,
        // including the ALTER that could fix it)
        val cm = prop("checkMode").getOrElse("fail")
        require(cm == "fail" || cm == "drop" || cm == "warn",
          s"checkMode must be fail|drop|warn, got '$cm'")
        cm
      },
      schemaJson = schema.json,
      // validate eagerly (same bricking argument as checkMode): the spec
      // must parse AND fit the source column's type, or the first INSERT
      // would fail into an already-created table
      partitionTransforms = {
        partitionTransforms.zip(partitionCols).foreach { case (spec, c) =>
          val t = graft.lake.PartTransform.parse(spec)
          schema.fields.find(_.name == c).foreach(f =>
            require(t.validFor(f.dataType),
              s"partition transform '${t.spec}' is not valid for " +
                s"column $c: ${f.dataType.simpleString}"))
        }
        require(partitionTransforms.isEmpty ||
            prop("globalIndex").exists(_.toBoolean),
          "transformed partitioning requires TBLPROPERTIES " +
            "(globalIndex='true'): record identity cannot depend on a " +
            "transformed partition value")
        partitionTransforms
      })
  }

  // ---- staged creation: CTAS / REPLACE TABLE [AS SELECT] ---------------
  //
  // Both CREATE and REPLACE stage a complete side table in a HIDDEN
  // sibling directory (`.name.stage-<uuid>`) — the live root is never
  // touched while the AS SELECT runs, so concurrent readers (and, for
  // CREATE, a racing CTAS of the same ident) cannot be disturbed.
  // Publish first makes the stage fully self-contained (commit-log file
  // paths rewritten to the final root via relocateTo, descriptor saved
  // INTO the stage), then swaps it in with atomic renames:
  //   CREATE:  rename(stage -> root)
  //   REPLACE: rename(root -> .name.trash-<uuid>); rename(stage -> root);
  //            delete(trash)
  // Every crash point leaves either the old or the new table complete:
  // before the swap the live root is untouched (the stage is hidden
  // garbage, reclaimed by vacuum_staging); between the two REPLACE
  // renames the ORIGINAL table sits complete in the trash dir and
  // [[maybeRecover]] restores it on the next catalog lookup; after the
  // swap the NEW table is complete at the root (a leftover trash dir is
  // reclaimed lazily). Dot-prefixed directories are invisible to every
  // catalog surface and seg() rejects dot-prefixed user identifiers, so
  // the staging namespace cannot collide with user tables. Publishes
  // serialize on a JVM-wide lock; cross-process DDL races are out of
  // scope (the engine is single-writer per table, matching the
  // reference's MaxConcurrentRuns: 1).

  /** test hook: invoked with a step label at each publish step boundary —
    * a spec that throws from here simulates a process crash at exactly
    * that point of the publish sequence */
  private[sql] var publishHook: String => Unit = _ => ()

  private def hiddenSibling(ident: Identifier, kind: String): Path =
    new Path(nsPath(ident.namespace),
      s".${seg(ident.name)}.$kind-${java.util.UUID.randomUUID()}")

  /** make a stage directory self-contained at its FINAL address while it
    * is still hidden: rewrite commit-log paths, then save the descriptor
    * into the stage (also creating the dir for an empty-SELECT stage) */
  private def prepareStage(stageRoot: Path, root: Path, desc: TableDescriptor): Unit = {
    new graft.lake.CommitLog(stageRoot.toString, hconf).relocateTo(root.toString)
    publishHook("relocated")
    TableDescriptor.save(stageRoot.toString, desc, hconf)
    publishHook("staged-descriptor")
  }

  override def stageCreate(
      ident: Identifier, schema: StructType, partitions: Array[Transform],
      properties: util.Map[String, String]): StagedTable = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val root = tablePath(ident)
    val stageRoot = hiddenSibling(ident, "stage")
    val desc = buildDescriptor(schema, partitions, properties)
    val inner = new GraftTableV2(
      spark, catalogName, ident.toString, stageRoot.toString, desc, None)
    new GraftStagedTable(inner,
      onCommit = () => {
        prepareStage(stageRoot, root, desc)
        GraftCatalog.publishLock.synchronized {
          if (isTableDir(root)) {
            // a racing CTAS of the same ident published first: fail
            // clean, leaving the winner untouched
            fs.delete(stageRoot, true)
            throw new TableAlreadyExistsException(ident)
          }
          // a descriptor-less leftover at the root is reclaimable — and
          // must go, or rename would nest the stage INSIDE it (Hadoop
          // rename moves src into an existing destination directory)
          if (fs.exists(root)) fs.delete(root, true)
          fs.mkdirs(root.getParent)
          require(fs.rename(stageRoot, root),
            s"failed to publish staged create of $ident")
        }
        publishHook("published")
      },
      onAbort = () => { fs.delete(stageRoot, true); () })
  }

  override def stageReplace(
      ident: Identifier, schema: StructType, partitions: Array[Transform],
      properties: util.Map[String, String]): StagedTable = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    stagedReplace(ident, schema, partitions, properties)
  }

  override def stageCreateOrReplace(
      ident: Identifier, schema: StructType, partitions: Array[Transform],
      properties: util.Map[String, String]): StagedTable =
    if (tableExists(ident)) stagedReplace(ident, schema, partitions, properties)
    else stageCreate(ident, schema, partitions, properties)

  private def stagedReplace(
      ident: Identifier, schema: StructType, partitions: Array[Transform],
      properties: util.Map[String, String]): StagedTable = {
    val root = tablePath(ident)
    val stageRoot = hiddenSibling(ident, "stage")
    val desc = buildDescriptor(schema, partitions, properties)
    val inner = new GraftTableV2(
      spark, catalogName, ident.toString, stageRoot.toString, desc, None)
    new GraftStagedTable(inner,
      onCommit = () => {
        prepareStage(stageRoot, root, desc)
        val trash = hiddenSibling(ident, "trash")
        GraftCatalog.publishLock.synchronized {
          require(!fs.exists(root) || fs.rename(root, trash),
            s"failed to set aside current contents of $ident")
          publishHook("old-aside")
          if (!fs.rename(stageRoot, root)) {
            // swap-in failed with the old table already aside: put it
            // back before surfacing the failure — REPLACE never happened
            if (fs.exists(trash)) fs.rename(trash, root)
            throw new IllegalStateException(
              s"failed to publish staged replacement of $ident")
          }
          publishHook("published")
          fs.delete(trash, true)
        }
      },
      onAbort = () => { fs.delete(stageRoot, true); () })
  }

  /** Reclaim dead staging artifacts under `namespace`
    * (`CALL graft.system.vacuum_staging(namespace, older_than_ms)`):
    * first finish any crashed-REPLACE rollback (an orphaned trash dir
    * whose table root is gone is RESTORED, never deleted), then delete
    * hidden stage/trash dirs older than the horizon — the age guard
    * protects stage dirs whose AS SELECT is still running. Returns the
    * deleted paths. */
  private[sql] def vacuumStaging(namespace: Array[String], olderThanMs: Long): Seq[String] =
    GraftCatalog.publishLock.synchronized {
      val dir = nsPath(namespace)
      if (!fs.exists(dir)) Seq.empty
      else {
        val now = System.currentTimeMillis()
        fs.listStatus(dir).toSeq.filter(_.isDirectory).flatMap { s =>
          s.getPath.getName match {
            case GraftCatalog.HiddenDir(tbl, kind) =>
              val rootLive = isTableDir(new Path(dir, tbl))
              if (kind == "trash" && !rootLive && isTableDir(s.getPath)) {
                // crashed REPLACE: the trash copy is the only table left
                fs.rename(s.getPath, new Path(dir, tbl))
                None
              } else if (now - s.getModificationTime >= olderThanMs) {
                fs.delete(s.getPath, true)
                Some(s.getPath.toString)
              } else None
            case _ => None
          }
        }
      }
    }

  /** `ALTER TABLE ... ADD COLUMN / RENAME COLUMN / DROP COLUMN / ALTER
    * COLUMN TYPE` — schema evolution as metadata-only commits through
    * [[graft.lake.LakeTable]] (column-identity semantics: renames alias
    * old files, drops never resurrect, type changes must widen). On a
    * table with no commits yet the declared descriptor schema is edited
    * in place (there are no files to adapt). */
  /** descriptor knobs `ALTER TABLE ... SET/UNSET TBLPROPERTIES` may
    * change: maintenance and indexing only. Layout identity — keyCols,
    * precombineCol, partitionCols, globalIndex, storageType,
    * hashBuckets — is immutable: existing files were written under it
    * and every read/merge path assumes it. */
  private val MutableProps = Set(
    "compactEvery", "checkpointEvery", "archiveOnClean", "occRetries",
    "deleteMode", "updateMode", "bloomKeys",
    "bloomCols", "sumCols", "statsCols", "clusterCols", "zOrder", "checks",
    "checkMode", "shredPaths",
    // NOT layout identity: setting it is partition-spec EVOLUTION
    // (future writes only; per-file spec ids keep old files readable —
    // LakeTable.evolvePartitionSpec), the one sanctioned layout change
    "partitionTransforms",
    // materialized views only: retunes the rewrite's staleness budget
    "maxStaleness")

  private def alterProperties(
      root: String, desc: TableDescriptor,
      lake: graft.lake.LakeTable, changes: Seq[TableChange]): Unit = {
    def csv(v: String): Seq[String] =
      v.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    def guard(k: String): Unit = require(MutableProps.contains(k),
      s"table property '$k' is not alterable — layout identity " +
        "(keyCols/precombineCol/partitionCols/globalIndex/storageType/" +
        s"hashBuckets) is immutable; alterable: ${MutableProps.toSeq.sorted.mkString(", ")}")
    val next = changes.foldLeft(desc) {
      case (d, s: TableChange.SetProperty) =>
        guard(s.property)
        s.property match {
          case "compactEvery" => d.copy(compactEvery = s.value.toInt)
          case "occRetries" => d.copy(occRetries = s.value.toInt)
          case "deleteMode" => d.copy(deleteMode = s.value)
          case "updateMode" => d.copy(updateMode = s.value)
          case "checkpointEvery" => d.copy(checkpointEvery = s.value.toInt)
          case "archiveOnClean" => d.copy(archiveOnClean = s.value.toBoolean)
          case "bloomKeys" => d.copy(bloomKeys = s.value.toInt)
          case "bloomCols" => d.copy(bloomCols = csv(s.value))
          case "sumCols" => d.copy(sumCols = csv(s.value))
          case "statsCols" => d.copy(statsCols = csv(s.value))
          case "clusterCols" => d.copy(clusterCols = csv(s.value))
          case "zOrder" => d.copy(zOrder = s.value.toBoolean)
          case "checks" => d.copy(checks = parseChecksProp(s.value))
          case "checkMode" => d.copy(checkMode = s.value)
          case "shredPaths" => d.copy(shredPaths =
            s.value.split(";").map(_.trim).filter(_.nonEmpty).toSeq)
          case "maxStaleness" =>
            // materialized views only: retune the transparent rewrite's
            // staleness budget post-create (0 = back to the exact gate);
            // an integer is a commit budget, a duration a wall-clock one
            val mv = Option(d.matView).getOrElse(throw
              new UnsupportedOperationException(
                "maxStaleness applies to MATERIALIZED VIEWS only"))
            val (n, ms) = MvStaleness.parse(s.value)
            d.copy(matView = mv.copy(
              maxStalenessCommits = n, maxStalenessMs = ms))
          case "partitionTransforms" =>
            // spec evolution routes through the engine API (validation,
            // prior-spec bookkeeping, persist); merge ONLY the spec
            // fields it saved back into the fold accumulator — replacing
            // `d` wholesale with the disk copy would silently discard
            // other properties set earlier in the SAME statement
            lake.evolvePartitionSpec(csv(s.value))
            TableDescriptor.load(root, hconf).map(saved => d.copy(
              partitionTransforms = saved.partitionTransforms,
              priorPartitionSpecs = saved.priorPartitionSpecs)).getOrElse(d)
        }
      case (d, r: TableChange.RemoveProperty) =>
        guard(r.property)
        r.property match {
          case "compactEvery" => d.copy(compactEvery = 0)
          case "occRetries" => d.copy(occRetries = 0)
          case "deleteMode" => d.copy(deleteMode = "rewrite")
          case "updateMode" => d.copy(updateMode = "rewrite")
          case "checkpointEvery" => d.copy(checkpointEvery = 0)
          case "archiveOnClean" => d.copy(archiveOnClean = false)
          case "bloomKeys" => d.copy(bloomKeys = 0)
          case "bloomCols" => d.copy(bloomCols = Seq.empty)
          case "sumCols" => d.copy(sumCols = Seq.empty)
          case "statsCols" => d.copy(statsCols = Seq.empty)
          case "clusterCols" => d.copy(clusterCols = Seq.empty)
          case "zOrder" => d.copy(zOrder = false)
          case "checks" => d.copy(checks = Map.empty)
          case "checkMode" => d.copy(checkMode = "fail")
          case "shredPaths" => d.copy(shredPaths = Seq.empty)
          case "maxStaleness" =>
            Option(d.matView).fold(d)(mv => d.copy(matView =
              mv.copy(maxStalenessCommits = 0, maxStalenessMs = 0L)))
          case "partitionTransforms" =>
            // unset = evolve back to the identity spec (future writes).
            // Already-identity specs are a no-op, not an error — every
            // other RemoveProperty is an idempotent reset, and
            // evolvePartitionSpec's same-spec guard would throw here
            val alreadyIdentity = Option(d.partitionTransforms)
              .getOrElse(Seq.empty)
              .forall(graft.lake.PartTransform.parse(_) ==
                graft.lake.PartTransform.Identity)
            if (alreadyIdentity) d
            else {
              lake.evolvePartitionSpec(
                Option(d.partitionCols).getOrElse(Seq.empty).map(_ => "identity"))
              TableDescriptor.load(root, hconf).map(saved => d.copy(
                partitionTransforms = saved.partitionTransforms,
                priorPartitionSpecs = saved.priorPartitionSpecs)).getOrElse(d)
            }
        }
      // ANSI `ALTER TABLE ... ADD/DROP CONSTRAINT`: CHECK constraints
      // join the engine's enforced per-write predicates (Spark's
      // AddCheckConstraint exec has already validated EXISTING rows —
      // its plan carries the NOT(pred) scan — before this call)
      case (d, a: TableChange.AddConstraint) => a.constraint() match {
        case c: org.apache.spark.sql.connector.catalog.constraints.Check =>
          val n = c.name.toLowerCase
          require(!Option(d.checks).getOrElse(Map.empty).contains(n),
            s"constraint '$n' already exists")
          d.copy(checks = Option(d.checks).getOrElse(Map.empty) +
            (n -> c.predicateSql()))
        case other => throw new UnsupportedOperationException(
          s"only CHECK constraints can be added (got ${other.toDDL}) — " +
            "UNIQUE/FK are unenforced and therefore not accepted")
      }
      case (d, r: TableChange.DropConstraint) =>
        val n = r.name.toLowerCase
        val have = Option(d.checks).getOrElse(Map.empty)
        if (!have.contains(n) && r.ifExists) d
        else {
          require(have.contains(n), s"no such constraint '$n'")
          d.copy(checks = have - n)
        }
      case (_, other) => throw new UnsupportedOperationException(
        s"unsupported ALTER TABLE change: $other")
    }
    // referenced columns must exist; the config constructor re-checks
    // structural invariants (zOrder arity etc.)
    val schema = if (lake.exists) lake.tableSchema()
      else Option(next.schemaJson).filter(_.nonEmpty)
        .map(j => org.apache.spark.sql.types.DataType.fromJson(j)
          .asInstanceOf[StructType]).getOrElse(new StructType())
    (next.statsCols ++ next.clusterCols ++
        Option(next.bloomCols).getOrElse(Seq.empty) ++
        Option(next.sumCols).getOrElse(Seq.empty) ++
        Option(next.shredPaths).getOrElse(Seq.empty)
          .map(e => graft.lake.ShredSpec.parse(e).column)).foreach(c =>
      require(schema.fieldNames.contains(c),
        s"declared column '$c' is not in the table schema"))
    next.config(root)
    // a NEW or changed CHECK must hold for every EXISTING row (Delta's
    // add-constraint validation) — one scan, NULL passes (ANSI, the
    // same rule the write-side guard applies)
    val added = Option(next.checks).getOrElse(Map.empty).toSet --
      Option(desc.checks).getOrElse(Map.empty).toSet
    if (added.nonEmpty && lake.exists) {
      // OCC guard for the validate→save window: a concurrent writer
      // still holding the PRE-check descriptor could land violating
      // rows after the validation scan read its snapshot. Pin the head
      // commit the scan validated, and abort if the timeline advanced
      // before the descriptor save — the caller retries against the new
      // head. (The residual race — a commit landing between this probe
      // and the save — is the descriptor store's documented
      // non-transactional window: the descriptor is config, not data,
      // and does not participate in the commit log's OCC.)
      val validatedHead = lake.log.latestId
      val snap = lake.read()
      added.foreach { case (name, expr) =>
        val bad = snap.filter(graft.lake.LakeTable.checkViolates(expr))
        require(bad.isEmpty,
          s"cannot add CHECK '$name': existing rows violate ($expr)")
      }
      val headNow = lake.log.latestId
      require(headNow == validatedHead,
        s"cannot add CHECK: a concurrent commit advanced the table " +
          s"($validatedHead -> $headNow) after validation — retry the ALTER")
    }
    TableDescriptor.save(root, next, hconf)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val root = tablePath(ident).toString
    val desc = TableDescriptor.load(root, hconf)
      .getOrElse(throw new NoSuchTableException(ident))
    val lake = graft.lake.LakeTable(spark, desc.config(root))
    val (propChanges, colChanges) = changes.partition {
      case _: TableChange.SetProperty | _: TableChange.RemoveProperty => true
      // constraint changes edit the descriptor's checks map — the same
      // persistence class as properties (alterProperties handles them)
      case _: TableChange.AddConstraint | _: TableChange.DropConstraint => true
      case _ => false
    }
    if (propChanges.nonEmpty)
      alterProperties(root, desc, lake, propChanges)
    if (colChanges.isEmpty) return loadTable(ident)
    // nested ADD COLUMN ... DEFAULT is supported since r16: the constant
    // rides the nested field's metadata and SchemaEvo.adapt's struct
    // rebuild backfills it for pre-field rows (see LakeTable.addColumn)
    // property changes just rewrote the descriptor — thread the LIVE one
    // through the column path (its pinned set reads statsCols/clusterCols,
    // and the pre-first-commit save would otherwise clobber the props)
    val descNow =
      if (propChanges.isEmpty) desc
      else TableDescriptor.load(root, hconf).getOrElse(desc)
    val changesSeq = colChanges
    if (lake.exists) {
      // dry-run EVERY change against a simulated schema before applying
      // ANY: a multi-change ALTER whose later change fails validation
      // must not leave the table half-altered. The simulation runs the
      // SAME SchemaEvo path-surgery the apply phase uses (plus the
      // pinned/internal guards LakeTable adds), so nothing passes here
      // and fails mid-apply. Nested paths (s.f, any depth) are
      // first-class: identity-carrying rename/widen, fresh-id add,
      // no-resurrect drop — the same laws as the top level.
      import graft.lake.SchemaEvo
      // columns the engine DERIVES things from are pinned too: a rename
      // would silently break materialized-view refresh recipes and
      // generated-column recompute (their expressions resolve by name)
      def exprRefs(ex: String): Seq[String] =
        scala.util.Try(spark.sessionState.sqlParser.parseExpression(ex)
          .collect {
            case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
              a.nameParts.head
          }).getOrElse(Seq.empty)
      val derivedPinned =
        Option(descNow.generatedCols).getOrElse(Map.empty).keys.toSeq ++
        Option(descNow.generatedCols).getOrElse(Map.empty).values.flatMap(exprRefs) ++
        Option(descNow.identityCols).getOrElse(Map.empty).keys.toSeq ++
        Option(descNow.matViews).getOrElse(Seq.empty).flatMap { r =>
          TableDescriptor.load(r, hconf).flatMap(d => Option(d.matView)).toSeq
            .flatMap { mv =>
              mv.dims ++
                (Option(mv.sums).getOrElse(Map.empty) ++
                  Option(mv.mins).getOrElse(Map.empty) ++
                  Option(mv.maxs).getOrElse(Map.empty)).values.flatMap(exprRefs) ++
                // star-schema recipes also resolve join keys and the
                // WHERE predicate by bare name — pin those too (dim
                // descriptors carry the registration, so a dim-side
                // rename is guarded the same way)
                Option(mv.dimJoins).getOrElse(Seq.empty)
                  .flatMap(dj => dj.factKeysN ++ dj.dimKeysN) ++
                Option(mv.filterSql).toSeq.flatMap(exprRefs)
            }
        }
      val pinned = (descNow.keyCols ++ descNow.partitionCols ++
        descNow.statsCols ++ descNow.clusterCols ++
        Option(descNow.shredPaths).getOrElse(Seq.empty)
          .map(e => graft.lake.ShredSpec.parse(e).column) ++
        derivedPinned :+
        descNow.precombineCol).toSet
      def guard(path: Seq[String]): Unit = {
        require(!SchemaEvo.isInternal(path.head) && !pinned.contains(path.head),
          s"column '${path.head}' is pinned by the table configuration " +
            "(key/partition/stats/cluster/shred/precombine, an identity or " +
            "generated column or one its expression reads, or a column a " +
            "registered materialized view derives from)")
      }
      changesSeq.foldLeft(lake.tableSchema()) { (schema, ch) =>
        ch match {
          case c: TableChange.AddColumn =>
            if (c.fieldNames.length > 1) guard(c.fieldNames.toSeq)
            SchemaEvo.addAt(schema, c.fieldNames.toSeq, c.dataType)
          case c: TableChange.RenameColumn =>
            guard(c.fieldNames.toSeq)
            SchemaEvo.renameAt(schema, c.fieldNames.toSeq, c.newName)
          case c: TableChange.DeleteColumn =>
            guard(c.fieldNames.toSeq)
            SchemaEvo.dropAt(schema, c.fieldNames.toSeq)
          case c: TableChange.UpdateColumnType =>
            guard(c.fieldNames.toSeq)
            SchemaEvo.widenAt(schema, c.fieldNames.toSeq, c.newDataType)
          case c: TableChange.UpdateColumnDefaultValue =>
            // SET/DROP DEFAULT: metadata-only — validate shape here, the
            // constant itself is validated by setColumnDefault at apply
            require(c.fieldNames.length == 1,
              "SET DEFAULT on a nested field is not supported")
            require(schema.fieldNames.contains(c.fieldNames.head),
              s"no column '${c.fieldNames.head}'")
            schema
          case other => throw new UnsupportedOperationException(
            s"unsupported ALTER TABLE change: $other")
        }
      }
      // SET/DROP DEFAULT must ALSO keep the catalog declaration
      // (desc.schemaJson) in step: loadTable overlays declared default
      // metadata onto the commit schema, so a stale declared value
      // would shadow the new one (and survive a DROP DEFAULT)
      def syncDeclaredDefault(name: String, sql: Option[String]): Unit = {
        val dNow = TableDescriptor.load(root, hconf).getOrElse(descNow)
        Option(dNow.schemaJson).filter(_.nonEmpty).foreach { j =>
          val st = org.apache.spark.sql.types.DataType.fromJson(j)
            .asInstanceOf[StructType]
          if (st.fieldNames.contains(name)) {
            val upd = StructType(st.fields.map { f =>
              if (f.name != name) f
              else {
                val mb = new org.apache.spark.sql.types.MetadataBuilder()
                  .withMetadata(f.metadata)
                sql match {
                  case Some(v) => mb.putString("CURRENT_DEFAULT", v)
                  case None => mb.remove("CURRENT_DEFAULT")
                }
                f.copy(metadata = mb.build())
              }
            })
            TableDescriptor.save(root, dNow.copy(schemaJson = upd.json), hconf)
          }
        }
      }
      changesSeq.foreach {
        case c: TableChange.AddColumn =>
          lake.addColumn(c.fieldNames.toSeq, c.dataType,
            Option(c.defaultValue()).map(_.getSql))
        case c: TableChange.RenameColumn =>
          lake.renameColumn(c.fieldNames.toSeq, c.newName)
        case c: TableChange.DeleteColumn => lake.dropColumn(c.fieldNames.toSeq)
        case c: TableChange.UpdateColumnType =>
          lake.widenColumn(c.fieldNames.toSeq, c.newDataType)
        case c: TableChange.UpdateColumnDefaultValue =>
          val sql = Option(c.newDefaultValue()).map(_.trim).filter(_.nonEmpty)
          lake.setColumnDefault(c.fieldNames.head, sql)
          syncDeclaredDefault(c.fieldNames.head, sql)
        case other => throw new UnsupportedOperationException(
          s"unsupported ALTER TABLE change: $other")
      }
    } else {
      // pre-first-commit: evolve the DECLARED schema (no files exist)
      val declared = Option(desc.schemaJson).filter(_.nonEmpty)
        .map(j => org.apache.spark.sql.types.DataType.fromJson(j).asInstanceOf[StructType])
        .getOrElse(new StructType())
      import graft.lake.SchemaEvo
      val next = changesSeq.foldLeft(declared) { (s, ch) =>
        ch match {
          case c: TableChange.AddColumn =>
            // pre-first-commit DEFAULT: only the declaration matters (no
            // files exist to backfill) — store it like CREATE TABLE
            // does, nested paths included (addAt mints the metadata)
            val dflt = Option(c.defaultValue()).map(_.getSql)
            dflt.foreach(sql => lake.validateDefault(
              c.fieldNames.mkString("."), c.dataType, sql))
            SchemaEvo.addAt(s, c.fieldNames.toSeq, c.dataType, dflt)
          case c: TableChange.RenameColumn =>
            SchemaEvo.renameAt(s, c.fieldNames.toSeq, c.newName)
          case c: TableChange.DeleteColumn =>
            SchemaEvo.dropAt(s, c.fieldNames.toSeq)
          case c: TableChange.UpdateColumnType =>
            // no files exist yet, so ANY retype of the declared schema
            // is safe — bypass the live-file widening lattice
            SchemaEvo.transformStructAt(s, c.fieldNames.toSeq.init, st => {
              val n = c.fieldNames.last
              require(st.fieldNames.contains(n), s"no column '$n'")
              StructType(st.fields.map(f =>
                if (f.name == n) f.copy(dataType = c.newDataType) else f))
            })
          case c: TableChange.UpdateColumnDefaultValue =>
            // SET/DROP DEFAULT pre-first-commit: pure declaration edit
            require(c.fieldNames.length == 1,
              "SET DEFAULT on a nested field is not supported")
            val n = c.fieldNames.head
            require(s.fieldNames.contains(n), s"no column '$n'")
            val sql = Option(c.newDefaultValue()).map(_.trim).filter(_.nonEmpty)
            // same "validated now, loudly" gate the post-first-commit
            // path applies via setColumnDefault
            sql.foreach(lake.validateDefault(n, s(n).dataType, _))
            StructType(s.fields.map { f =>
              if (f.name != n) f
              else {
                val mb = new org.apache.spark.sql.types.MetadataBuilder()
                  .withMetadata(f.metadata)
                sql match {
                  case Some(v) => mb.putString("CURRENT_DEFAULT", v)
                  case None => mb.remove("CURRENT_DEFAULT")
                }
                f.copy(metadata = mb.build())
              }
            })
          case other => throw new UnsupportedOperationException(
            s"unsupported ALTER TABLE change: $other")
        }
      }
      TableDescriptor.save(root, descNow.copy(schemaJson = next.json), hconf)
    }
    loadTable(ident)
  }

  /** delete this ident's hidden trash dirs. A trash dir outliving its
    * publish (crash between the swap and the trash delete) is harmless
    * while the root exists — but after a DROP or RENAME of that ident,
    * [[maybeRecover]] would misread it as a crashed REPLACE and
    * RESURRECT the stale copy under the old name on the next lookup.
    * Drop/rename therefore retire the name's trash with it. In-flight
    * stage dirs are left alone (an AS SELECT may still be writing). */
  private def dropTrashOf(ident: Identifier): Unit = {
    val ns = nsPath(ident.namespace)
    if (fs.exists(ns)) fs.listStatus(ns).foreach { s =>
      s.getPath.getName match {
        case GraftCatalog.HiddenDir(tbl, "trash") if tbl == ident.name =>
          fs.delete(s.getPath, true); ()
        case _ => ()
      }
    }
  }

  override def dropTable(ident: Identifier): Boolean =
    GraftCatalog.publishLock.synchronized {
      // tableExists (not bare isTableDir) so a table parked in a trash
      // dir by a crashed REPLACE is restored first and properly dropped
      if (!tableExists(ident)) false
      else {
        // dropping a MATERIALIZED VIEW deregisters it from its source's
        // descriptor (the rewrite rule tolerates stale entries, but a
        // clean drop keeps the registry honest); best-effort — a failed
        // deregistration must not block the drop
        val root = tablePath(ident).toString
        for {
          d <- scala.util.Try(TableDescriptor.load(root, hconf)).toOption.flatten
          mv <- Option(d.matView)
          src <- scala.util.Try(TableDescriptor.load(mv.source, hconf)).toOption.flatten
          if Option(src.matViews).exists(_.contains(root))
        } scala.util.Try(TableDescriptor.save(mv.source,
          src.copy(matViews = src.matViews.filterNot(_ == root)), hconf))
        val gone = fs.delete(tablePath(ident), true)
        dropTrashOf(ident) // a stale trash must not resurrect the name
        gone
      }
    }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    GraftCatalog.publishLock.synchronized {
      if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
      if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
      val oldRoot = tablePath(oldIdent)
      val newRoot = tablePath(newIdent)
      // the commit log records ABSOLUTE file paths, so the rename must
      // relocate them. Sequence is crash-convergent: the marker (naming
      // the old root) is written first and travels with the directory;
      // any load of the new ident finishes a partial relocation
      // ([[healRelocation]]) before serving reads. A crash before the
      // rename leaves the marker on the live table, where healing
      // degenerates to a no-op delete (old root == current root).
      val marker = new Path(oldRoot, "_log/_relocate")
      val out = fs.create(marker, true)
      try out.write(oldRoot.toString.getBytes("UTF-8")) finally out.close()
      fs.mkdirs(nsPath(newIdent.namespace))
      if (!fs.rename(oldRoot, newRoot))
        throw new IllegalStateException(s"rename $oldIdent -> $newIdent failed")
      healRelocation(newRoot)
      dropTrashOf(oldIdent) // ditto: the old name must stay gone
    }

  // ---- stored procedures (CALL graft.system.<proc>(...)) --------------

  /** resolve a procedure's `table` argument ("ns.tbl" / "ns1.ns2.tbl")
    * to the LakeTable at its warehouse path */
  private def lakeFor(name: String): graft.lake.LakeTable = {
    val parts = name.split('.')
    require(parts.length >= 1 && parts.forall(_.nonEmpty),
      s"bad table name '$name' (expected [ns.]table)")
    val ident = Identifier.of(parts.init, parts.last)
    val root = tablePath(ident).toString
    val desc = TableDescriptor.load(root, hconf)
      .getOrElse(throw new NoSuchTableException(ident))
    graft.lake.LakeTable(spark, desc.config(root))
  }

  /** Zero-copy shallow clone at a snapshot (None = latest), published
    * with the staged-create choreography: the clone's metadata lands in
    * a hidden sibling (its commits reference the SOURCE's files by
    * absolute path, so the rename moves nothing it points at), the
    * descriptor is saved into the stage, and one atomic rename makes
    * the table exist. Shared by `CALL graft.system.clone` and the
    * `CREATE TABLE ... SHALLOW CLONE` spelling. Returns the clone's
    * head commit id. */
  private[sql] def cloneTable(srcName: String, dstName: String,
      asOf: Option[Long], deep: Boolean = false): Long = {
    val src = lakeFor(srcName)
    val parts = dstName.split('.')
    require(parts.length >= 1 && parts.forall(_.nonEmpty),
      s"bad clone target '$dstName' (expected [ns.]table)")
    val tgt = Identifier.of(parts.init, parts.last)
    val root = tablePath(tgt)
    val stage = hiddenSibling(tgt, "stage")
    val clone =
      if (deep) src.deepClone(stage.toString, asOf)
      else src.shallowClone(stage.toString, asOf)
    val desc = TableDescriptor.load(src.config.root, hconf)
      .getOrElse(throw new IllegalStateException(
        s"clone source $srcName has no catalog descriptor"))
    TableDescriptor.save(stage.toString, desc.copy(
      schemaJson = clone.log.schemaJsonAsOf(None)
        .getOrElse(desc.schemaJson)), hconf)
    // a DEEP clone's commits reference its OWN files under the stage
    // path — the publish rename moves them, so ride the relocation-heal
    // machinery RENAME TABLE already uses (marker first, heal after)
    if (deep) {
      val marker = new Path(stage, "_log/_relocate")
      val out = fs.create(marker, true)
      try out.write(stage.toString.getBytes("UTF-8")) finally out.close()
    }
    // resolve the head BEFORE the publish rename: the handle points at
    // the STAGE path, which stops existing the moment the rename lands
    val head = clone.log.latestId.getOrElse(-1L)
    GraftCatalog.publishLock.synchronized {
      if (isTableDir(root)) {
        fs.delete(stage, true)
        throw new TableAlreadyExistsException(tgt)
      }
      if (fs.exists(root)) fs.delete(root, true)
      fs.mkdirs(root.getParent)
      require(fs.rename(stage, root),
        s"failed to publish clone ${tgt}")
    }
    if (deep) healRelocation(root)
    head
  }

  override def loadProcedure(ident: Identifier):
      org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    require(ident.namespace.sameElements(GraftProcedures.Namespace),
      s"procedures live under the 'system' namespace, got $ident")
    // catalog-level (not table-level) maintenance: lives here because it
    // needs the warehouse fs / ident resolution, not just a LakeTable
    if (ident.name == "vacuum_staging")
      GraftProcedures.make("vacuum_staging",
        Seq("namespace" -> org.apache.spark.sql.types.StringType,
          "older_than_ms" -> org.apache.spark.sql.types.LongType),
        in => vacuumStaging(
          in.getUTF8String(0).toString.split('.').filter(_.nonEmpty),
          in.getLong(1)).size.toLong)
    else if (ident.name == "txn_reap")
      // CALL graft.system.txn_reap(coord_dir, older_than_ms) — abort
      // every undecided multi-table transaction older than the horizon
      // (GraftTxn.abortStale: the atomic decision marker arbitrates
      // against a late commit). Returns the number reaped. Coordinator
      // dirs are plain paths (transactions span tables and warehouses),
      // so this is catalog-level maintenance, not per-table.
      GraftProcedures.make("txn_reap",
        Seq("coord_dir" -> org.apache.spark.sql.types.StringType,
          "older_than_ms" -> org.apache.spark.sql.types.LongType),
        in => graft.lake.GraftTxn.abortStale(spark,
          in.getUTF8String(0).toString, in.getLong(1)).size.toLong)
    else if (ident.name == "clone")
      // CALL graft.system.clone('db.src', 'db.dst', commit) — zero-copy
      // shallow clone at a snapshot (commit -1 = latest), published with
      // the staged-create choreography: the clone's metadata lands in a
      // hidden sibling (its commits reference the SOURCE's files by
      // absolute path, so the rename moves nothing it points at), the
      // descriptor is saved into the stage, and one atomic rename makes
      // the table exist. Returns the clone's head commit id.
      GraftProcedures.make("clone",
        Seq("table" -> org.apache.spark.sql.types.StringType,
          "target" -> org.apache.spark.sql.types.StringType,
          "commit" -> org.apache.spark.sql.types.LongType),
        in => cloneTable(in.getUTF8String(0).toString,
          in.getUTF8String(1).toString,
          Some(in.getLong(2)).filter(_ >= 0)))
    else if (ident.name == "publish")
      // CALL graft.system.publish('db.t', 'db.t_audit') — the publish
      // step of write-audit-publish: the audit table (a shallow clone of
      // 'db.t' that audited writes landed on) fast-forwards its net
      // effect onto the source as ONE atomic commit (LakeTable
      // .publishFrom: zero-copy, OCC against a source that advanced).
      // Returns the publish commit id (or the unchanged head when the
      // audit made no changes).
      GraftProcedures.make("publish",
        Seq("table" -> org.apache.spark.sql.types.StringType,
          "audit_table" -> org.apache.spark.sql.types.StringType),
        in => lakeFor(in.getUTF8String(0).toString)
          .publishFrom(lakeFor(in.getUTF8String(1).toString)))
    else GraftProcedures.load(ident.name, lakeFor).getOrElse(
      throw new IllegalArgumentException(s"no procedure ${ident.name}; " +
        s"available: ${(GraftProcedures.names ++ GraftCatalog.CatalogProcs).sorted.mkString(", ")}"))
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (!namespace.sameElements(GraftProcedures.Namespace)) Array.empty
    else (GraftProcedures.names ++ GraftCatalog.CatalogProcs).sorted
      .map(n => Identifier.of(GraftProcedures.Namespace, n)).toArray

  // ---- namespaces ------------------------------------------------------

  override def listNamespaces(): Array[Array[String]] =
    if (!fs.exists(new Path(warehouse))) Array.empty
    else fs.listStatus(new Path(warehouse)).toSeq
      .filter(s => s.isDirectory && !s.getPath.getName.startsWith(".") &&
        !isTableDir(s.getPath))
      .map(s => Array(s.getPath.getName)).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    val dir = nsPath(namespace)
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(dir).toSeq
      .filter(s => s.isDirectory && !s.getPath.getName.startsWith(".") &&
        !isTableDir(s.getPath))
      .map(s => namespace :+ s.getPath.getName).toArray
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || fs.exists(nsPath(namespace))

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    Map.empty[String, String].asJava
  }

  override def createNamespace(
      namespace: Array[String], metadata: util.Map[String, String]): Unit = {
    fs.mkdirs(nsPath(namespace)); ()
  }

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("ALTER NAMESPACE is not supported")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val dir = nsPath(namespace)
    if (!fs.exists(dir)) false
    else {
      require(cascade || fs.listStatus(dir).isEmpty,
        s"namespace ${namespace.mkString(".")} is not empty")
      fs.delete(dir, true)
    }
  }
}

private[sql] object GraftCatalog {
  /** serializes staged publishes and recovery swaps within this JVM —
    * the rename choreography is multi-step, and two concurrent publishes
    * (or a publish racing a recovery) must observe each other's renames
    * atomically. Cross-process DDL is out of scope (single-writer). */
  val publishLock = new Object

  /** hidden staging-artifact dir name: `.<table>.<stage|trash>-<uuid>` */
  val HiddenDir: scala.util.matching.Regex =
    """^\.(.+)\.(stage|trash)-[0-9a-fA-F-]+$""".r

  /** procedures implemented BY the catalog (warehouse-level), beyond the
    * per-table set in [[GraftProcedures]] */
  val CatalogProcs: Seq[String] = Seq("vacuum_staging", "clone", "publish")
}

/** A staged (not yet visible) table for CTAS / REPLACE TABLE: plain
  * delegation to the real [[GraftTableV2]] for schema and the write
  * surface — Spark runs the AS SELECT write against it exactly as it
  * would against a live table — plus the publish/abort callbacks the
  * catalog chose for this staging mode. */
private final class GraftStagedTable(
    inner: GraftTableV2,
    onCommit: () => Unit,
    onAbort: () => Unit)
  extends StagedTable with SupportsRead with SupportsWrite {

  override def name(): String = inner.name()
  override def schema(): StructType = inner.schema()
  override def partitioning(): Array[Transform] = inner.partitioning()
  override def properties(): util.Map[String, String] = inner.properties()
  override def capabilities(): util.Set[TableCapability] = inner.capabilities()
  override def newScanBuilder(options: CaseInsensitiveStringMap) =
    inner.newScanBuilder(options)
  override def newWriteBuilder(info: org.apache.spark.sql.connector.write.LogicalWriteInfo) =
    inner.newWriteBuilder(info)
  override def commitStagedChanges(): Unit = onCommit()
  override def abortStagedChanges(): Unit = onAbort()
}
