package graft.sql

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Crash-safety of the staged CTAS / REPLACE publish choreography.
  *
  * The publish sequence is instrumented with [[GraftCatalog.publishHook]]
  * step labels; throwing from the hook simulates a process crash at that
  * exact point (Spark then runs the abort path, same as a driver failure
  * before the statement returns). The contract under test: at EVERY
  * crash point the table stays readable with either the old or the new
  * contents — never neither, never a corrupt mixture.
  */
class StagedPublishSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val wh = {
    val dir = Files.createTempDirectory("graft_wh_staged").toString
    spark.conf.set("spark.sql.catalog.gsp", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gsp.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gsp.db")
    dir
  }

  private def cat: GraftCatalog =
    spark.sessionState.catalogManager.catalog("gsp").asInstanceOf[GraftCatalog]

  private def rows(sql: String): Seq[Seq[Any]] =
    spark.sql(sql).collect().toSeq.map(_.toSeq)

  private def fs = new Path(wh).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def hiddenDirs(): Seq[String] =
    fs.listStatus(new Path(wh, "db")).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("."))

  test("REPLACE publish: a crash at every step leaves old or new contents, never neither") {
    wh
    // steps in publish order; the expected survivor at each crash point
    val steps = Seq(
      "relocated" -> "old", // stage self-containment, live root untouched
      "staged-descriptor" -> "old", // descriptor landed in stage only
      "old-aside" -> "old", // root in trash dir -> recovery restores it
      "published" -> "new") // swap done; only trash cleanup was lost
    for (((step, survivor), i) <- steps.zipWithIndex) {
      val tbl = s"gsp.db.cr$i"
      spark.sql(s"""CREATE TABLE $tbl USING graft
        TBLPROPERTIES (keyCols='pk', precombineCol='ts')
        AS SELECT 1L AS pk, 1 AS ts, 'old' AS v""")
      cat.publishHook =
        s => if (s == step) throw new RuntimeException(s"injected crash at $s")
      try intercept[Exception] {
        spark.sql(s"""REPLACE TABLE $tbl USING graft
          TBLPROPERTIES (keyCols='pk', precombineCol='ts')
          AS SELECT 1L AS pk, 1 AS ts, 'new' AS v""")
      } finally cat.publishHook = _ => ()
      assert(rows(s"SELECT v FROM $tbl") == Seq(Seq(survivor)),
        s"crash at '$step' must leave the $survivor table readable")
      // and the recovered table stays writable (full table, not a husk)
      spark.sql(s"INSERT INTO $tbl VALUES (2L, 1, 'more')")
      assert(rows(s"SELECT count(*) FROM $tbl") == Seq(Seq(2L)))
    }
  }

  test("racing CTAS of one ident: one publishes, one fails clean") {
    wh
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    def ctas(v: String): java.util.concurrent.Future[Option[Throwable]] =
      pool.submit(() => {
        start.await(10, TimeUnit.SECONDS)
        try { spark.sql(s"""CREATE TABLE gsp.db.race USING graft
          TBLPROPERTIES (keyCols='pk', precombineCol='ts')
          AS SELECT 1L AS pk, 1 AS ts, '$v' AS v"""); None }
        catch { case t: Throwable => Some(t) }
      })
    val (fa, fb) = (ctas("a"), ctas("b"))
    start.countDown()
    val outcomes = Seq(fa.get(60, TimeUnit.SECONDS), fb.get(60, TimeUnit.SECONDS))
    pool.shutdown()
    assert(outcomes.count(_.isEmpty) == 1,
      s"exactly one racing CTAS must win, got $outcomes")
    val v = rows("SELECT v FROM gsp.db.race")
    assert(v == Seq(Seq("a")) || v == Seq(Seq("b")),
      "the table must hold exactly the winner's contents")
    // the loser's stage must not have nested itself inside the table root
    val rootFiles = fs.listStatus(new Path(s"$wh/db/race")).map(_.getPath.getName)
    assert(!rootFiles.exists(_.contains(".stage-")),
      s"loser's stage dir leaked into the table root: ${rootFiles.toSeq}")
  }

  test("vacuum_staging reclaims dead artifacts, restores orphaned trash, spares live stages") {
    wh
    spark.sql(s"""CREATE TABLE gsp.db.vs USING graft
      TBLPROPERTIES (keyCols='pk', precombineCol='ts')
      AS SELECT 1L AS pk, 1 AS ts, 'keep' AS v""")
    val db = new Path(wh, "db")
    // a crashed CTAS's stage dir: descriptor-less hidden garbage
    fs.mkdirs(new Path(db, ".vs2.stage-00000000-dead-dead-dead-000000000000"))
    // a crashed REPLACE at its worst point: root gone, table in trash
    val trash = new Path(db, ".vs.trash-00000000-dead-dead-dead-000000000001")
    assert(fs.rename(new Path(db, "vs"), trash))
    // a "live" stage (age below the horizon) must survive the sweep
    fs.mkdirs(new Path(db, ".vs3.stage-00000000-1111-2222-3333-444444444444"))

    val deletedOld = cat.vacuumStaging(Array("db"), olderThanMs = 3600000L)
    assert(deletedOld.isEmpty, "nothing is old enough for a 1h horizon")
    assert(rows("SELECT v FROM gsp.db.vs") == Seq(Seq("keep")),
      "the sweep must RESTORE an orphaned trash table regardless of age")

    val deleted = cat.vacuumStaging(Array("db"), olderThanMs = 0L)
    assert(deleted.exists(_.contains(".vs2.stage-")),
      s"dead stage dir must be reclaimed, deleted=$deleted")
    assert(hiddenDirs().isEmpty, s"sweep at horizon 0 clears all staging artifacts: ${hiddenDirs()}")
    assert(rows("SELECT v FROM gsp.db.vs") == Seq(Seq("keep")))
    // SQL surface
    spark.sql("CALL gsp.system.vacuum_staging('db', 0L)").collect()
  }

  test("a stale trash dir never resurrects a dropped or renamed table") {
    wh
    def crashLeavingTrash(tbl: String): Unit = {
      // crash exactly after the swap: root holds the NEW table, the OLD
      // copy is stranded in a trash dir (the one state that outlives a
      // successful publish)
      cat.publishHook =
        s => if (s == "published") throw new RuntimeException("injected")
      try intercept[Exception] {
        spark.sql(s"""REPLACE TABLE $tbl USING graft
          TBLPROPERTIES (keyCols='pk', precombineCol='ts')
          AS SELECT 1L AS pk, 1 AS ts, 'new' AS v""")
      } finally cat.publishHook = _ => ()
    }
    // DROP: the name must stay gone despite the stale trash
    spark.sql("""CREATE TABLE gsp.db.rz USING graft
      TBLPROPERTIES (keyCols='pk', precombineCol='ts')
      AS SELECT 1L AS pk, 1 AS ts, 'old' AS v""")
    crashLeavingTrash("gsp.db.rz")
    spark.sql("DROP TABLE gsp.db.rz")
    assert(!spark.catalog.tableExists("gsp.db.rz"),
      "dropped table must not resurrect from its stale trash dir")
    intercept[Exception] { rows("SELECT * FROM gsp.db.rz") }
    // and a re-CREATE starts from scratch, not from the old copy
    spark.sql("""CREATE TABLE gsp.db.rz (pk BIGINT, ts INT, v STRING)
      USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    assert(rows("SELECT count(*) FROM gsp.db.rz") == Seq(Seq(0L)))
    // RENAME: the OLD name must stay gone too
    spark.sql("""CREATE TABLE gsp.db.rn1 USING graft
      TBLPROPERTIES (keyCols='pk', precombineCol='ts')
      AS SELECT 1L AS pk, 1 AS ts, 'old' AS v""")
    crashLeavingTrash("gsp.db.rn1")
    spark.sql("ALTER TABLE gsp.db.rn1 RENAME TO db.rn2")
    assert(!spark.catalog.tableExists("gsp.db.rn1"),
      "renamed-away name must not resurrect from its stale trash dir")
    assert(rows("SELECT v FROM gsp.db.rn2") == Seq(Seq("new")))
    // the renamed table stays a full READ-WRITE table: its commit-log
    // paths were relocated, so upserts can rewrite the moved files
    spark.sql("INSERT INTO gsp.db.rn2 VALUES (1L, 9, 'post-rename')")
    assert(rows("SELECT v FROM gsp.db.rn2 ORDER BY pk") == Seq(Seq("post-rename")))
  }

  test("staging artifacts are invisible to every catalog listing") {
    wh
    val db = new Path(wh, "db")
    // a stage dir WITH a descriptor inside (crash after staged-descriptor)
    spark.sql(s"""CREATE TABLE gsp.db.inv USING graft
      TBLPROPERTIES (keyCols='pk', precombineCol='ts')
      AS SELECT 1L AS pk, 1 AS ts""")
    assert(fs.rename(new Path(db, "inv"), new Path(db, ".inv2.stage-0000-a")))
    val tables = spark.sql("SHOW TABLES IN gsp.db").collect().map(_.getString(1)).toSeq
    assert(!tables.exists(_.startsWith(".")), s"hidden dirs leaked into SHOW TABLES: $tables")
    val nss = spark.sql("SHOW NAMESPACES IN gsp").collect().map(_.getString(0)).toSeq
    assert(!nss.exists(_.startsWith(".")), s"hidden dirs leaked into SHOW NAMESPACES: $nss")
    // dot-prefixed user identifiers are rejected (reserved namespace)
    intercept[Exception] { spark.sql("SELECT * FROM gsp.db.`.inv2`") }
    cat.vacuumStaging(Array("db"), 0L)
  }
}
