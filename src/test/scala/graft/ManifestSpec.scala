package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import graft.lake.{LakeTable, LakeTableConfig}

/** External-engine manifest export (Delta `_symlink_format_manifest`
  * role; reference S6 — Redshift/spectrum_setup.sql:2-11 attaches the
  * shared catalog and scans the live Hudi table from a second engine).
  * The exported list must be exactly the snapshot's live base files, a
  * glob over the symlink dir must read the snapshot back byte-identical,
  * and any operation that physically deletes files (clean / rollback /
  * restore) must invalidate every manifest rather than leave a dangling
  * file list behind.
  */
class ManifestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshRoot(): String =
    Files.createTempDirectory("mantest").resolve("tbl").toString

  private def df(rows: (Long, String, Int)*): DataFrame = {
    import spark.implicits._
    rows.toDF("pk", "payload", "ts")
  }

  private def mk(storage: String = "cow"): LakeTable = {
    val t = LakeTable(spark, LakeTableConfig(freshRoot(),
      keyCols = Seq("pk"), precombineCol = "ts", storageType = storage))
    t.bulkInsert(df((1L, "a", 0), (2L, "b", 0)))
    t.upsert(df((2L, "b1", 1), (3L, "c", 1)))
    t
  }

  private def manifestLines(root: String, name: String): Seq[String] =
    Files.readAllLines(Paths.get(root, "_manifests", name))
      .toArray.toSeq.map(_.toString).filter(_.nonEmpty)

  test("export lists exactly the snapshot's live files; glob read matches") {
    val t = mk()
    val id = t.exportManifest()
    assert(id == 1L)
    val lines = manifestLines(t.config.root, f"manifest-$id%08d.txt")
    val live = t.log.liveFiles(None).map(_.path).toSet
    assert(lines.map(p => p.stripPrefix("file:")).toSet ==
      live.map(_.stripPrefix("file:")), "manifest == live file set")
    // a glob-only reader over the symlink dir sees the exact snapshot
    val viaLinks = spark.read
      .parquet(s"${t.config.root}/_manifests/latest/*.parquet")
      .select("pk", "payload", "ts").collect().map(_.toSeq).toSet
    val engine = t.read().select("pk", "payload", "ts")
      .collect().map(_.toSeq).toSet
    assert(viaLinks == engine)
  }

  test("version-pinned export reads the PAST snapshot; head aliases untouched") {
    val t = mk()
    t.exportManifest() // head (c1) -> latest
    val pastId = t.exportManifest(Some(0L))
    assert(pastId == 0L)
    val past = spark.read
      .parquet(s"${t.config.root}/_manifests/v00000000/*.parquet")
      .select("pk", "payload").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(past == Map(1L -> "a", 2L -> "b"))
    // latest still points at the head snapshot (3 keys)
    val head = spark.read
      .parquet(s"${t.config.root}/_manifests/latest/*.parquet")
    assert(head.count() == 3)
  }

  test("MoR exports the read-optimized view: base files only") {
    val t = mk("mor")
    t.exportManifest()
    val lines = manifestLines(t.config.root, "latest.txt")
    val base = t.log.liveFiles(None).filterNot(_.isDelta).map(_.path).toSet
    val deltas = t.log.liveFiles(None).filter(_.isDelta)
    assert(deltas.nonEmpty, "fixture must actually have delta files")
    assert(lines.map(_.stripPrefix("file:")).toSet ==
      base.map(_.stripPrefix("file:")))
  }

  test("clean / rollback / restore invalidate every exported manifest") {
    val t = mk()
    t.upsert(df((1L, "a2", 2)))
    t.exportManifest(Some(1L))
    t.exportManifest()
    val manDir = Paths.get(t.config.root, "_manifests")
    assert(Files.exists(manDir))
    t.clean(1)
    assert(!Files.exists(manDir), "clean must drop manifests")

    val t2 = mk()
    t2.exportManifest()
    t2.rollback()
    assert(!Files.exists(Paths.get(t2.config.root, "_manifests")),
      "rollback must drop manifests")

    val t3 = mk()
    t3.exportManifest()
    t3.restoreTo(0L)
    assert(!Files.exists(Paths.get(t3.config.root, "_manifests")),
      "restore must drop manifests")
  }

  test("export refuses non-travelable snapshots and empty tables") {
    val t = mk()
    t.upsert(df((1L, "a2", 2)))
    t.clean(1)
    intercept[IllegalArgumentException](t.exportManifest(Some(0L)))
    val empty = LakeTable(spark, LakeTableConfig(freshRoot(),
      keyCols = Seq("pk"), precombineCol = "ts"))
    intercept[IllegalArgumentException](empty.exportManifest())
  }

  test("SQL surface: CALL graft.system.export_manifest") {
    val wh = Files.createTempDirectory("man_wh").toString
    spark.conf.set("spark.sql.catalog.mg", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.mg.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mg.db")
    spark.sql("""CREATE TABLE mg.db.t (pk BIGINT, payload STRING, ts INT)
      USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("INSERT INTO mg.db.t VALUES (1, 'a', 0), (2, 'b', 0)")
    val res = spark.sql("CALL mg.system.export_manifest('db.t', -1)")
      .collect()
    assert(res.head.getLong(0) == 0L)
    val viaLinks = spark.read.parquet(s"$wh/db/t/_manifests/latest/*.parquet")
    assert(viaLinks.count() == 2)
  }
}
