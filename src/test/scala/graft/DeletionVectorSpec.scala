package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import graft.lake.{LakeTable, LakeTableConfig}

/** Deletion vectors (Iceberg v2 position deletes / Delta DV role): a
  * point delete on a CoW table writes a per-target-file position
  * sidecar instead of rewriting the file. Laws pinned here:
  *   - read/time-travel/count semantics identical to the keyed rewrite;
  *   - NO data file is rewritten by the delete (the write-amplification
  *     claim, checked structurally: the commit adds only `dv` entries);
  *   - re-deletes are no-ops; positions never double-count;
  *   - a rewrite of the target (upsert/recluster) retires its DVs in
  *     the same commit and the cleaner sweeps them physically;
  *   - change tails emit the tombstoned rows;
  *   - metadata counts subtract DV positions exactly, min/max/sum
  *     provers refuse, the native-scan certification refuses;
  *   - manifest export refuses while DVs are live.
  */
class DeletionVectorSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshRoot(): String =
    Files.createTempDirectory("dvtest").resolve("tbl").toString

  private def df(rows: (Long, Int, String, Int)*): DataFrame = {
    import spark.implicits._
    rows.toDF("pk", "part", "payload", "ts")
  }

  private def keysOf(pks: Long*): DataFrame = {
    import spark.implicits._
    pks.toDF("pk")
  }

  private def mk(parts: Boolean = true, stats: Boolean = false): LakeTable = {
    val t = LakeTable(spark, LakeTableConfig(freshRoot(),
      keyCols = Seq("pk"), precombineCol = "ts",
      partitionCols = if (parts) Seq("part") else Seq.empty,
      statsCols = if (stats) Seq("pk") else Seq.empty))
    t.bulkInsert(df((1L, 1, "a", 0), (2L, 1, "b", 0), (3L, 2, "c", 0),
      (4L, 2, "d", 0)))
    t
  }

  test("deleteDv hides the rows without rewriting any data file") {
    val t = mk()
    val before = t.log.liveFiles(None).map(_.path).toSet
    val id = t.deleteDv(keysOf(2L, 3L))
    val c = t.log.commitIfExists(id).get
    assert(c.op == "dv_delete")
    assert(c.removes.isEmpty && c.adds.nonEmpty && c.adds.forall(_.isDv),
      "a DV delete must add only dv sidecars and remove nothing")
    assert(t.log.liveFiles(None).map(_.path).toSet == before,
      "no data file may be rewritten")
    assert(t.read().select("pk").collect().map(_.getLong(0)).toSet ==
      Set(1L, 4L))
    // time travel to before the delete sees the rows
    assert(t.readAsOf(id - 1).count() == 4)
    // predicate reads work through the DV filter
    assert(t.read(org.apache.spark.sql.functions.col("part") === 1)
      .select("pk").collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("re-delete is a no-op; counts subtract positions exactly") {
    val t = mk()
    val id = t.deleteDv(keysOf(2L))
    assert(t.deleteDv(keysOf(2L)) == id, "re-delete must not commit")
    assert(t.countRows(None) == 3)
    assert(t.metadataRowCount(None).contains(3L))
    val parts = t.partitionRowCounts().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(parts == Map(1 -> 1L, 2 -> 2L), parts.toString)
    // min/max/sum provers refuse under live DVs (the deleted row could
    // have held the extreme); the scan path stays exact
    val ts = LakeTable(spark, t.config.copy(statsCols = Seq("pk")))
    assert(ts.metadataMinMax("pk", None).isEmpty)
  }

  test("deleteWhereDv routes predicates; mixed deletes compose") {
    import org.apache.spark.sql.functions.col
    val t = mk()
    t.deleteWhereDv(col("payload") === "a")
    assert(t.read().select("pk").collect().map(_.getLong(0)).toSet ==
      Set(2L, 3L, 4L))
    t.delete(keysOf(4L)) // keyed rewrite composes with live DVs
    assert(t.read().select("pk").collect().map(_.getLong(0)).toSet ==
      Set(2L, 3L))
  }

  test("upsert of a DV'd key resurrects it; the rewrite retires the DV") {
    val t = mk()
    t.deleteDv(keysOf(2L))
    assert(t.log.liveDvs(None).nonEmpty)
    t.upsert(df((2L, 1, "b2", 1)))
    assert(t.read().filter("pk = 2").select("payload")
      .collect().map(_.getString(0)).toSeq == Seq("b2"))
    // the upsert rewrote partition 1's file group: its DV must be retired
    assert(t.log.liveDvs(None).isEmpty,
      "a rewrite of the target must retire its DVs in the same commit")
    // and once cleaned, the sidecar is physically gone
    t.clean(retain = 1)
    val dataDir = new java.io.File(t.config.root, "data")
    def anyDvLeft(d: java.io.File): Boolean =
      Option(d.listFiles()).getOrElse(Array.empty).exists(f =>
        if (f.isDirectory) anyDvLeft(f) else f.getName.startsWith("dv-"))
    assert(!anyDvLeft(dataDir), "cleaner must sweep superseded DV sidecars")
  }

  test("recluster folds DVs into plain base files") {
    val t = LakeTable(spark, LakeTableConfig(freshRoot(),
      keyCols = Seq("pk"), precombineCol = "ts",
      partitionCols = Seq("part"), clusterCols = Seq("pk")))
    t.bulkInsert(df((1L, 1, "a", 0), (2L, 1, "b", 0), (3L, 2, "c", 0)))
    t.deleteDv(keysOf(2L))
    t.recluster()
    assert(t.log.liveDvs(None).isEmpty, "recluster must fold DVs in")
    assert(t.read().select("pk").collect().map(_.getLong(0)).toSet ==
      Set(1L, 3L))
    // the rewritten snapshot is DV-free: metadata min/max proves again
    assert(t.metadataRowCount(None).contains(2L))
  }

  test("CoW tail emits DV tombstones, typed and untyped") {
    val t = mk()
    val untyped = new graft.sources.GraftTailSource(
      spark.sqlContext, t, t.tailSchema)
    val typed = new graft.sources.GraftTailSource(
      spark.sqlContext, t, t.changeFeedSchema, changeTypes = true)
    val id = t.deleteDv(keysOf(2L, 3L))
    val u = untyped.batchFrame(id - 1, id)
      .select("pk", "_deleted").collect()
    assert(u.map(r => (r.getLong(0), r.getBoolean(1))).toSet ==
      Set((2L, true), (3L, true)))
    val ty = typed.batchFrame(id - 1, id)
      .select("pk", "_change_type").collect()
    assert(ty.map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((2L, "delete"), (3L, "delete")))
  }

  test("guards: MoR refuses; manifest exports deletes; native scan stays eligible") {
    import org.apache.spark.sql.functions.col
    val mor = LakeTable(spark, LakeTableConfig(freshRoot(),
      keyCols = Seq("pk"), precombineCol = "ts", storageType = "mor"))
    mor.bulkInsert(df((1L, 1, "a", 0)))
    intercept[IllegalArgumentException](mor.deleteDv(keysOf(1L)))
    val t = mk()
    t.deleteDv(keysOf(2L))
    // a DV'd snapshot exports: the file list PLUS the position-deletes
    // parquet an external engine anti-joins away (r14) — the old refusal
    // is gone
    val id = t.exportManifest()
    val deletes = spark.read.parquet(
      s"${t.config.root}/_manifests/latest_deletes.parquet")
    assert(deletes.columns.toSeq ==
      Seq("file_path", "link_name", "row_index"))
    assert(deletes.count() == 1L, "one DV'd position exported")
    // external-read emulation: manifest file list minus the exported
    // positions must equal the engine's own snapshot read
    val listed = scala.io.Source.fromFile(
      s"${t.config.root}/_manifests/manifest-${"%08d".format(id)}.txt")
      .getLines().toSeq
    val raw = spark.read.parquet(listed: _*)
      .select(col("pk"),
        graft.lake.DvCodec.normPathCol(col("_metadata.file_path"))
          .as("__f"),
        col("_metadata.row_index").as("__p"))
    val ext = raw.join(deletes,
        raw("__f") === graft.lake.DvCodec.normPathCol(deletes("file_path")) &&
          raw("__p") === deletes("row_index"),
        "left_anti")
      .select("pk").collect().map(_.getLong(0)).toSet
    assert(ext == t.read().select("pk").collect().map(_.getLong(0)).toSet)
    // live DVs do NOT demote the native batch path anymore: the scan
    // applies position sidecars per-file (NativeScanSpec pins the
    // end-to-end read); only the prover's other conditions still gate it
    assert(t.nativeScanFiles(None).nonEmpty,
      "live DVs must not cost the snapshot its native scan eligibility")
  }

  test("SQL COUNT pushdown answers from metadata under live DVs") {
    val wh = Files.createTempDirectory("dv_cnt_wh").toString
    spark.conf.set("spark.sql.catalog.dvc", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.dvc.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dvc.db")
    spark.sql("""CREATE TABLE dvc.db.t (pk BIGINT, part INT, payload STRING,
      ts INT) USING graft PARTITIONED BY (part)
      TBLPROPERTIES (keyCols='pk', precombineCol='ts', deleteMode='dv')""")
    val vals = (1 to 40).map(i => s"($i, ${i % 4}, 'p$i', 0)").mkString(", ")
    spark.sql(s"INSERT INTO dvc.db.t VALUES $vals")
    spark.sql("DELETE FROM dvc.db.t WHERE pk IN (3, 7, 11, 19)")
    assert(spark.sql("SELECT count(*) AS n FROM dvc.db.t")
      .collect()(0).getLong(0) == 36L)
    // prove the METADATA path: delete the parquet data files out from
    // under the table — a count that still answers never opened them
    // (the DV adjustment comes from the commit log's position counts,
    // not the sidecar bytes)
    val dataDir = new org.apache.hadoop.fs.Path(s"$wh/db/t/data")
    val fs = dataDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(dataDir, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) fs.delete(f.getPath, false)
    }
    assert(spark.sql("SELECT count(*) AS n FROM dvc.db.t")
      .collect()(0).getLong(0) == 36L,
      "COUNT under live DVs must be answered from the commit log alone")
  }

  test("SQL surface: deleteMode='dv' routes DELETE FROM through sidecars") {
    val wh = Files.createTempDirectory("dv_wh").toString
    spark.conf.set("spark.sql.catalog.dvs", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.dvs.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dvs.db")
    spark.sql("""CREATE TABLE dvs.db.t (pk BIGINT, part INT, payload STRING,
      ts INT) USING graft PARTITIONED BY (part)
      TBLPROPERTIES (keyCols='pk', precombineCol='ts', deleteMode='dv')""")
    spark.sql("INSERT INTO dvs.db.t VALUES (1, 1, 'a', 0), (2, 1, 'b', 0), " +
      "(3, 2, 'c', 0), (4, 2, 'd', 0)")
    spark.sql("DELETE FROM dvs.db.t WHERE pk IN (2, 3)")
    val t = LakeTable(spark, graft.lake.TableDescriptor
      .load(s"$wh/db/t", spark.sparkContext.hadoopConfiguration).get
      .config(s"$wh/db/t"))
    val c = t.log.commitIfExists(t.log.latestId.get).get
    assert(c.op == "dv_delete" && c.removes.isEmpty && c.adds.forall(_.isDv),
      s"SQL DELETE under deleteMode=dv must be a position delete, got ${c.op}")
    assert(spark.sql("SELECT pk FROM dvs.db.t ORDER BY pk").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 4L))
    // unsetting the property restores the keyed rewrite
    spark.sql("ALTER TABLE dvs.db.t UNSET TBLPROPERTIES ('deleteMode')")
    spark.sql("DELETE FROM dvs.db.t WHERE pk = 4")
    val t2 = LakeTable(spark, graft.lake.TableDescriptor
      .load(s"$wh/db/t", spark.sparkContext.hadoopConfiguration).get
      .config(s"$wh/db/t"))
    val c2 = t2.log.commitIfExists(t2.log.latestId.get).get
    assert(c2.op == "delete", s"expected the rewrite path, got ${c2.op}")
    assert(spark.sql("SELECT pk FROM dvs.db.t ORDER BY pk").collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("updateDvWhere: new versions land, old positions hide, one commit") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    val t = mk()
    val before = t.log.liveFiles(None).map(_.path).toSet
    val id = t.updateDvWhere(col("part") === 1,
      Map("payload" -> concat(col("payload"), lit("!")), "ts" -> lit(5)))
    val c = t.log.commitIfExists(id).get
    assert(c.op == "dv_update" && c.removes.isEmpty)
    assert(c.adds.exists(_.isDv) && c.adds.exists(a => !a.isDv && !a.isDelta),
      "one commit must carry BOTH the position sidecars and the new versions")
    assert(before.subsetOf(t.log.liveFiles(None).map(_.path).toSet),
      "no pre-existing data file may be rewritten")
    val rows = t.read().select("pk", "payload", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(rows == Set((1L, "a!", 5), (2L, "b!", 5), (3L, "c", 0), (4L, "d", 0)))
    // assignments evaluated on the OLD row; time travel sees the old rows
    assert(t.readAsOf(id - 1).filter("pk = 1").select("payload")
      .collect().head.getString(0) == "a")
    // counts stay exact: 4 base rows + 2 new - 2 DV'd = 4
    assert(t.countRows(None) == 4)
    assert(t.metadataRowCount(None).contains(4L))
    // chained update of the same rows composes (positions in the NEW file)
    t.updateDvWhere(col("pk") === 1, Map("payload" -> lit("z")))
    assert(t.read().filter("pk = 1").select("payload")
      .collect().head.getString(0) == "z")
    assert(t.countRows(None) == 4)
  }

  test("typed CoW tail classifies dv_update as update_preimage/postimage") {
    import org.apache.spark.sql.functions.{col, lit}
    val t = mk()
    val typed = new graft.sources.GraftTailSource(
      spark.sqlContext, t, t.changeFeedSchema, changeTypes = true)
    val id = t.updateDvWhere(col("pk") === 2, Map("payload" -> lit("b9")))
    val ty = typed.batchFrame(id - 1, id)
      .select("pk", "payload", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(ty == Set((2L, "b", "update_preimage"), (2L, "b9", "update_postimage")))
    // untyped tail emits exactly the new version
    val untyped = new graft.sources.GraftTailSource(
      spark.sqlContext, t, t.tailSchema)
    val u = untyped.batchFrame(id - 1, id).select("pk", "payload").collect()
    assert(u.map(r => (r.getLong(0), r.getString(1))).toSet == Set((2L, "b9")))
  }

  test("SQL surface: updateMode='dv' routes UPDATE through sidecars") {
    val wh = Files.createTempDirectory("dvu_wh").toString
    spark.conf.set("spark.sql.catalog.dvu", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.dvu.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dvu.db")
    spark.sql("""CREATE TABLE dvu.db.t (pk BIGINT, part INT, payload STRING,
      ts INT) USING graft PARTITIONED BY (part)
      TBLPROPERTIES (keyCols='pk', precombineCol='ts', updateMode='dv')""")
    spark.sql("INSERT INTO dvu.db.t VALUES (1, 1, 'a', 0), (2, 2, 'b', 0)")
    spark.sql("UPDATE dvu.db.t SET payload = concat(payload, '+'), ts = 9 " +
      "WHERE pk = 1")
    val t = LakeTable(spark, graft.lake.TableDescriptor
      .load(s"$wh/db/t", spark.sparkContext.hadoopConfiguration).get
      .config(s"$wh/db/t"))
    val c = t.log.commitIfExists(t.log.latestId.get).get
    assert(c.op == "dv_update", s"expected the DV path, got ${c.op}")
    val rows = spark.sql("SELECT pk, payload, ts FROM dvu.db.t ORDER BY pk")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    assert(rows == Seq((1L, "a+", 9), (2L, "b", 0)))
    // identity assignment still refused on the DV path
    val e = intercept[Exception](spark.sql(
      "UPDATE dvu.db.t SET pk = 99 WHERE pk = 1"))
    assert(e.getMessage.contains("key/partition"), e.getMessage)
  }

  test("foldDvs rewrites ONLY heavily-DV'd files; tails skip the fold") {
    val t = mk() // partition 1: {1,2}, partition 2: {3,4}
    t.deleteDv(keysOf(3L)) // partition 2's file: 50% DV'd
    val untyped = new graft.sources.GraftTailSource(
      spark.sqlContext, t, t.tailSchema)
    val before = t.log.liveFiles(None)
    // ratio above the heavy file's fraction: nothing folds
    assert(t.foldDvs(0.9) == t.log.latestId.get)
    assert(t.log.liveDvs(None).nonEmpty)
    val id = t.foldDvs(0.5)
    val c = t.log.commitIfExists(id).get
    assert(c.op == "dv_fold")
    assert(t.log.liveDvs(None).isEmpty, "the heavy file's DV must fold away")
    // the untouched partition's file survives verbatim
    val p1Files = before.filter(_.partition.contains("1")).map(_.path).toSet
    assert(p1Files.subsetOf(t.log.liveFiles(None).map(_.path).toSet),
      "lightly/un-DV'd files must not be rewritten")
    assert(t.read().select("pk").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 4L))
    // physical reorg: the change tail emits nothing for the fold commit
    assert(untyped.batchFrame(id - 1, id).count() == 0)
    // metadata provers answer again once no DV is live
    assert(t.metadataRowCount(None).contains(3L))
  }

  test("maintenance policy folds DVs past the ratio") {
    import graft.lake.Maintenance
    val t = mk()
    t.deleteDv(keysOf(1L)) // partition 1's file: 50% DV'd
    assert(Maintenance.run(t, Maintenance.Policy(dvFoldRatio = 0.9)).isEmpty)
    val fired = Maintenance.run(t, Maintenance.Policy(dvFoldRatio = 0.4))
    assert(fired.map(_._1) == Seq("dv_fold"), fired.toString)
    assert(t.log.liveDvs(None).isEmpty)
    assert(Maintenance.run(t, Maintenance.Policy(dvFoldRatio = 0.4)).isEmpty)
  }

  test("shallowClone and branch publish carry deletion vectors") {
    import org.apache.spark.sql.functions.{col, lit}
    val t = mk()
    t.deleteDv(keysOf(2L))
    // the clone must see the DELETED state, not the raw files
    val clone = t.shallowClone(freshRoot())
    assert(clone.read().select("pk").collect().map(_.getLong(0)).toSet ==
      Set(1L, 3L, 4L), "a clone of a DV'd table must not resurrect rows")
    assert(clone.log.liveDvs(None).nonEmpty, "sidecars must be borrowed")
    // write-audit-publish: a position delete ON THE BRANCH publishes its
    // sidecars into the source atomically
    val t2 = mk()
    t2.createBranch("audit")
    val b = t2.branch("audit")
    b.deleteDv(keysOf(4L))
    b.updateDvWhere(col("pk") === 1, Map("payload" -> lit("a9")))
    t2.fastForward("audit")
    val rows = t2.read().select("pk", "payload").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows == Map(1L -> "a9", 2L -> "b", 3L -> "c"),
      s"published DV changes must land exactly: $rows")
  }

  test("unpartitioned table and global-key identity work the same") {
    val t = mk(parts = false)
    t.deleteDv(keysOf(1L, 4L))
    assert(t.read().select("pk").collect().map(_.getLong(0)).toSet ==
      Set(2L, 3L))
    assert(t.countRows(None) == 2)
  }
}
