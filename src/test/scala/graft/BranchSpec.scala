package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.lake.{CommitConflict, LakeTable, LakeTableConfig}

/** Writable branches (Iceberg branch refs): isolated read/write timeline
  * zero-copy off the source, atomic fast-forward publish, OCC against a
  * source that advanced, drop-safety for published files, and the SQL
  * surface (`db.t.branch_<name>` identifier + create_branch /
  * fast_forward / drop_branch procedures + the `.branches` metadata
  * table).
  */
class BranchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshRoot(): String =
    Files.createTempDirectory("branchtest").resolve("tbl").toString

  private def df(rows: (Long, String, Int)*): DataFrame = {
    import spark.implicits._
    rows.toDF("pk", "payload", "ts")
  }

  private def mk(): LakeTable = {
    val t = LakeTable(spark, LakeTableConfig(freshRoot(),
      keyCols = Seq("pk"), precombineCol = "ts"))
    t.bulkInsert(df((1L, "a", 0), (2L, "b", 0)))
    t
  }

  private def payloads(t: LakeTable): Set[(Long, String)] = {
    import spark.implicits._
    t.read().select($"pk", $"payload").as[(Long, String)].collect().toSet
  }

  test("branch writes are isolated; fast-forward lands them atomically") {
    val t = mk()
    val b = t.createBranch("wip")
    assert(t.branches.keySet == Set("wip"))
    b.upsert(df((2L, "b2", 1), (3L, "c", 1)))
    // isolation both ways
    assert(payloads(t) == Set((1L, "a"), (2L, "b")))
    assert(payloads(t.branch("wip")) == Set((1L, "a"), (2L, "b2"), (3L, "c")))
    val head = t.log.latestId.get
    val pid = t.fastForward("wip")
    assert(pid > head)
    assert(payloads(t) == Set((1L, "a"), (2L, "b2"), (3L, "c")))
    // the publish was ONE commit, and the branch's rows read as "after
    // the pre-publish head" to incremental readers
    val ch = t.changesBetween(head, pid)
    assert(ch.filter(col("_change_type") === "update").count() == 1)
    assert(ch.filter(col("_change_type") === "insert").count() == 1)
  }

  test("fast-forward refuses when the source advanced since the branch") {
    val t = mk()
    val b = t.createBranch("wip")
    b.upsert(df((3L, "c", 1)))
    t.upsert(df((4L, "d", 1))) // source moves on
    intercept[CommitConflict] { t.fastForward("wip") }
    // source and branch both keep their own states
    assert(payloads(t) == Set((1L, "a"), (2L, "b"), (4L, "d")))
    assert(payloads(t.branch("wip")) == Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("dropBranch: unpublished drops clean; published refuses until cleaned past") {
    val t = mk()
    t.createBranch("scratch").upsert(df((9L, "z", 1)))
    t.dropBranch("scratch")
    assert(t.branches.isEmpty)
    intercept[IllegalArgumentException] { t.branch("scratch") }
    // published branch: its files are live on the source — refuse
    val b = t.createBranch("wip")
    b.upsert(df((3L, "c", 1)))
    t.fastForward("wip")
    val ex = intercept[IllegalArgumentException] { t.dropBranch("wip") }
    assert(ex.getMessage.contains("published"))
    assert(payloads(t) == Set((1L, "a"), (2L, "b"), (3L, "c")))
    // supersede the published file and clean past the publishing commit:
    // now the branch directory holds nothing the source can reach
    t.upsert(df((3L, "c2", 2)))
    t.clean(1)
    t.dropBranch("wip")
    assert(t.branches.isEmpty)
    assert(payloads(t) == Set((1L, "a"), (2L, "b"), (3L, "c2")))
  }

  test("branch names validate; duplicate create refuses; branch of branch root is its own table") {
    val t = mk()
    intercept[IllegalArgumentException] { t.createBranch("7") }
    intercept[IllegalArgumentException] { t.createBranch("bad name") }
    t.createBranch("wip")
    intercept[IllegalArgumentException] { t.createBranch("wip") }
  }

  test("SQL surface: branch_<name> identifier, procedures, .branches metadata table") {
    val wh = Files.createTempDirectory("branch_wh").toString
    spark.conf.set("spark.sql.catalog.gbr", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gbr.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gbr.db")
    spark.sql("""CREATE TABLE gbr.db.t (pk BIGINT, ts INT, v STRING)
                 USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("INSERT INTO gbr.db.t VALUES (1, 0, 'a'), (2, 0, 'b')")
    spark.sql("CALL gbr.system.create_branch('db.t', 'wip', -1)")
    spark.sql("INSERT INTO gbr.db.t.branch_wip VALUES (2, 1, 'b2'), (3, 1, 'c')")
    // isolation through SQL
    assert(spark.sql("SELECT v FROM gbr.db.t ORDER BY pk").collect()
      .map(_.getString(0)).toSeq == Seq("a", "b"))
    assert(spark.sql("SELECT v FROM gbr.db.t.branch_wip ORDER BY pk").collect()
      .map(_.getString(0)).toSeq == Seq("a", "b2", "c"))
    // metadata table lists the ref
    assert(spark.sql("SELECT name FROM gbr.db.t.branches").collect()
      .map(_.getString(0)).toSeq == Seq("wip"))
    spark.sql("CALL gbr.system.fast_forward('db.t', 'wip')")
    assert(spark.sql("SELECT v FROM gbr.db.t ORDER BY pk").collect()
      .map(_.getString(0)).toSeq == Seq("a", "b2", "c"))
    // published: drop_branch refuses; an unknown branch fails loud
    intercept[Exception] { spark.sql("CALL gbr.system.drop_branch('db.t', 'wip')") }
    intercept[Exception] { spark.sql("SELECT * FROM gbr.db.t.branch_nope") }
  }

  test("VERSION AS OF composes with the branch identifier (branch's own timeline)") {
    val wh = Files.createTempDirectory("branch_tt_wh").toString
    spark.conf.set("spark.sql.catalog.gbrt", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gbrt.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gbrt.db")
    spark.sql("""CREATE TABLE gbrt.db.t (pk BIGINT, ts INT, v STRING)
                 USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("INSERT INTO gbrt.db.t VALUES (1, 0, 'a')") // source c0
    spark.sql("CALL gbrt.system.create_branch('db.t', 'wip', -1)")
    // branch timeline continues the source id space: clone commit(s),
    // then this upsert — its head is the branch's latest
    spark.sql("INSERT INTO gbrt.db.t.branch_wip VALUES (1, 1, 'a2')")
    // the PRE-upsert branch snapshot still reads 'a' — the branch
    // timeline CONTINUES the source id space, so the clone commit that
    // borrowed the seed is id 1 (source head 0 + 1), and AS OF 0 names
    // a commit the branch never had
    intercept[Exception] {
      spark.sql("SELECT v FROM gbrt.db.t.branch_wip VERSION AS OF 0").collect()
    }
    assert(spark.sql("SELECT v FROM gbrt.db.t.branch_wip VERSION AS OF 1")
      .collect().map(_.getString(0)).toSeq == Seq("a"))
    assert(spark.sql("SELECT v FROM gbrt.db.t.branch_wip")
      .collect().map(_.getString(0)).toSeq == Seq("a2"))
  }

  test("metadata tables compose on the branch identifier") {
    val wh = Files.createTempDirectory("branch_meta_wh").toString
    spark.conf.set("spark.sql.catalog.gbm", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gbm.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gbm.db")
    spark.sql("""CREATE TABLE gbm.db.t (pk BIGINT, ts INT, v STRING)
                 USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("INSERT INTO gbm.db.t VALUES (1, 0, 'a')")        // source c0
    spark.sql("CALL gbm.system.create_branch('db.t', 'wip', -1)")
    spark.sql("INSERT INTO gbm.db.t.branch_wip VALUES (2, 1, 'b')")
    // the branch's OWN timeline: clone commit (id 1) then its upsert
    val ops = spark.sql(
      "SELECT commit_id, op FROM gbm.db.t.branch_wip.history ORDER BY commit_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(ops == Seq((1L, "clone"), (2L, "upsert")))
    // .files over the branch vs the source: the unpartitioned upsert
    // rewrote the whole branch into its OWN file, superseding the
    // borrowed seed — the two inventories must diverge completely
    val bFiles = spark.sql("SELECT path FROM gbm.db.t.branch_wip.files")
      .collect().map(_.getString(0)).toSet
    val sFiles = spark.sql("SELECT path FROM gbm.db.t.files")
      .collect().map(_.getString(0)).toSet
    assert(bFiles.nonEmpty && sFiles.nonEmpty && (bFiles & sFiles).isEmpty)
    // the SOURCE's history is untouched by the branch write
    assert(spark.sql("SELECT max(commit_id) FROM gbm.db.t.history")
      .first().getLong(0) == 0L)
  }

  test("UPDATE / DELETE / MERGE run against the branch identifier") {
    val wh = Files.createTempDirectory("branch_dml_wh").toString
    spark.conf.set("spark.sql.catalog.gbd", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gbd.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gbd.db")
    spark.sql("""CREATE TABLE gbd.db.t (pk BIGINT, ts INT, v STRING)
                 USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("INSERT INTO gbd.db.t VALUES (1, 0, 'a'), (2, 0, 'b')")
    spark.sql("CALL gbd.system.create_branch('db.t', 'wip', -1)")
    spark.sql("UPDATE gbd.db.t.branch_wip SET v = 'a2', ts = 1 WHERE pk = 1")
    spark.sql("DELETE FROM gbd.db.t.branch_wip WHERE pk = 2")
    spark.sql("""MERGE INTO gbd.db.t.branch_wip t
                 USING (SELECT CAST(3 AS BIGINT) pk, 1 ts, 'c' v) s
                 ON t.pk = s.pk
                 WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.sql("SELECT pk, v FROM gbd.db.t.branch_wip ORDER BY pk")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a2"), (3L, "c")))
    // main untouched by any of the branch DML
    assert(spark.sql("SELECT pk, v FROM gbd.db.t ORDER BY pk")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b")))
    // and the full edit set fast-forwards as ONE commit
    spark.sql("CALL gbd.system.fast_forward('db.t', 'wip')")
    assert(spark.sql("SELECT pk, v FROM gbd.db.t ORDER BY pk")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a2"), (3L, "c")))
  }
}
