package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import graft.lake.{Commit, CommitConflict, CommitLog, LakeTable, LakeTableConfig}

/** Timeline archival (Hudi archived-timeline role, the companion of the
  * reference's KEEP_LATEST_COMMITS cleaner — glue/HudiJarGlueJob.py:83):
  * the non-travelable prefix of `_log/` compacts into segment files, so
  * listing cost is O(travel horizon) on a table of any age. Archived
  * commits stay READABLE (history, change tails, audits); snapshot
  * travel to them refuses loud — their superseded files were already
  * physically cleaned, so the snapshot was unreconstructable anyway.
  */
class ArchiveSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def hconf = spark.sparkContext.hadoopConfiguration

  private def freshRoot(): String =
    Files.createTempDirectory("archtest").resolve("tbl").toString

  private def df(rows: (Long, String, Int)*): DataFrame = {
    import spark.implicits._
    rows.toDF("pk", "payload", "ts")
  }

  private def logFiles(root: String, prefix: String): Seq[String] = {
    val dir = new java.io.File(root, "_log")
    Option(dir.list()).map(_.toSeq).getOrElse(Seq.empty)
      .filter(_.startsWith(prefix)).sorted
  }

  /** bulkInsert + n upserts on ONE key (every commit supersedes the
    * previous file, so clean() has a full prefix to retire) */
  private def mk(n: Int = 9): LakeTable = {
    val t = LakeTable(spark, LakeTableConfig(freshRoot(),
      keyCols = Seq("pk"), precombineCol = "ts"))
    t.bulkInsert(df((1L, "v0", 0)))
    (1 to n).foreach(i => t.upsert(df((1L, s"v$i", i))))
    t
  }

  test("archive compacts the non-travelable prefix; head reads unchanged") {
    val t = mk() // commits 0..9
    t.clean(retain = 3) // cleanedUpTo = 7; travelable: 7, 8, 9
    val before = t.read().collect().toSeq
    val archived = t.archiveTimeline(segmentSize = 4)
    assert(archived == 7, s"expected commits 0..6 archived, got $archived")
    // listing: commits 7..9 + segments + boundary checkpoint only
    val jsons = logFiles(t.config.root, "").filter(_.matches("\\d+\\.json"))
    assert(jsons == Seq("00000007.json", "00000008.json", "00000009.json"), jsons)
    val segs = logFiles(t.config.root, "arch-")
    assert(segs == Seq("arch-00000000-00000003.json",
      "arch-00000004-00000006.json"), segs)
    assert(t.log.archiveUpTo == 6L)
    assert(t.read().collect().toSeq == before)
    // travel above the boundary still works, below refuses LOUD
    assert(t.readAsOf(7).count() == 1)
    // LakeTable's clean-horizon guard fires first ("was cleaned"); the
    // log-level guard ("archived") backs it for direct CommitLog readers
    val e = intercept[IllegalArgumentException](t.readAsOf(5))
    assert(e.getMessage.contains("cleaned") || e.getMessage.contains("archived"),
      e.getMessage)
    val e2 = intercept[IllegalArgumentException](t.log.liveFiles(Some(5L)))
    assert(e2.getMessage.contains("archived"), e2.getMessage)
    // nothing further eligible: second run is a no-op
    assert(t.archiveTimeline() == 0)
  }

  test("cold reader after archive: boundary checkpoint + live tail only") {
    val t = mk()
    t.clean(retain = 3)
    val warm = t.log.liveFiles()
    t.archiveTimeline()
    val cold = new CommitLog(t.config.root, hconf)
    assert(cold.liveFiles() == warm) // identical, order included
    assert(cold.ckptOpens.get() == 1L)
    assert(cold.jsonOpens.get() <= 3L, s"jsonOpens=${cold.jsonOpens.get()}")
    // writes continue: ids resolve past the archive, the guard refuses reuse
    intercept[CommitConflict](cold.append(Commit(3L, "upsert", 0L,
      cold.schemaJsonAsOf().get, Seq.empty, Seq.empty)))
    t.upsert(df((1L, "after-archive", 100)))
    assert(t.log.latestId.contains(10L))
    assert(t.read().select("payload").collect().map(_.getString(0)).toSeq ==
      Seq("after-archive"))
  }

  test("history and commit-range reads still see archived commits") {
    val t = mk()
    t.clean(retain = 3)
    val histBefore = t.history().collect().map(_.getLong(0)).sorted.toSeq
    val rangeBefore = t.log.commitsInRange(1, 5).map(_.id)
    t.archiveTimeline(segmentSize = 3)
    // full history, archived prefix included, one row per commit
    assert(t.history().collect().map(_.getLong(0)).sorted.toSeq == histBefore)
    assert(histBefore == (0L to 9L), histBefore)
    // tail catch-up positioned below the boundary: every commit in range
    // is served from the segments (commit METADATA readable — the data
    // files below the clean horizon are gone either way, same as before
    // archival)
    assert(t.log.commitsInRange(1, 5).map(_.id) == rangeBefore)
    assert(rangeBefore == (2L to 5L), rangeBefore)
  }

  test("pins block archival past them; releasing re-opens the horizon") {
    val t = mk()
    t.savepoint(5L)
    t.clean(retain = 2) // cleanedUpTo = 8, but the pin floors the horizon
    assert(t.archiveTimeline() == 5, "only commits 0..4 (below pin 5)")
    assert(t.log.archiveUpTo == 4L)
    assert(t.readAsOf(5).count() == 1) // pinned snapshot intact
    t.log.releaseSavepoint(5L)
    assert(t.archiveTimeline() == 3) // 5..7 now eligible (cleanedUpTo-1)
    assert(t.log.archiveUpTo == 7L)
  }

  test("released-pin leftovers are swept during archival") {
    val t = mk()
    t.savepoint(2L)
    t.clean(retain = 2) // snapshot-2's files exempt from deletion (pinned)
    val pinnedFiles = t.log.liveFiles(Some(2L)).map(_.path)
    assert(pinnedFiles.forall(p => new java.io.File(
      new java.net.URI(p).getPath).exists()), "pin kept files on disk")
    t.log.releaseSavepoint(2L)
    t.archiveTimeline()
    // the archive pass deleted what clean() will never revisit: files
    // superseded within the archived range that only a since-released
    // pin had exempted (head files untouched)
    val headFiles = t.log.liveFiles().map(_.path).toSet
    pinnedFiles.filterNot(headFiles).foreach { p =>
      assert(!new java.io.File(new java.net.URI(p).getPath).exists(),
        s"released-pin leftover survived archival: $p")
    }
  }

  test("restore and savepoint refuse archived targets; tags pin like savepoints") {
    val t = mk()
    t.createTag("v5", 5L)
    t.clean(retain = 2)
    assert(t.archiveTimeline() == 5) // tag pins 5: only 0..4 archived
    assert(t.readAsOf(5).count() == 1)
    intercept[IllegalArgumentException](t.restoreTo(3L))
    intercept[IllegalArgumentException](t.savepoint(3L))
    t.dropTag("v5")
    t.archiveTimeline()
    assert(t.log.archiveUpTo == 7L)
  }

  test("archiveOnClean: the cleaner pairs with archival automatically") {
    val t = LakeTable(spark, LakeTableConfig(freshRoot(),
      keyCols = Seq("pk"), precombineCol = "ts", archiveOnClean = true))
    t.bulkInsert(df((1L, "v0", 0)))
    (1 to 9).foreach(i => t.upsert(df((1L, s"v$i", i))))
    t.clean(retain = 3) // cleanedUpTo = 7 → commits 0..6 archive inline
    assert(t.log.archiveUpTo == 6L)
    assert(logFiles(t.config.root, "").count(_.matches("\\d+\\.json")) == 3)
    assert(t.read().select("payload").collect().head.getString(0) == "v9")
    // SQL knob round-trips CREATE → SHOW CREATE → ALTER UNSET
    val wh = Files.createTempDirectory("aoc_wh").toString
    spark.conf.set("spark.sql.catalog.aoc", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.aoc.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS aoc.db")
    spark.sql("""CREATE TABLE aoc.db.t (pk BIGINT, ts INT, v STRING)
      USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts',
      archiveOnClean='true')""")
    (0 to 5).foreach(i =>
      spark.sql(s"INSERT INTO aoc.db.t VALUES (1, $i, 'v$i')"))
    spark.sql("CALL aoc.system.clean('db.t', 2)") // archives inline
    val lt = LakeTable(spark,
      graft.lake.TableDescriptor.load(s"$wh/db/t",
        spark.sparkContext.hadoopConfiguration).get.config(s"$wh/db/t"))
    assert(lt.log.archiveUpTo == 3L)
    assert(spark.sql("SHOW CREATE TABLE aoc.db.t").collect().head
      .getString(0).contains("archiveOnClean"))
  }

  test("SQL surface: CALL graft.system.archive_timeline") {
    val wh = Files.createTempDirectory("arch_wh").toString
    spark.conf.set("spark.sql.catalog.arch", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.arch.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS arch.db")
    spark.sql("""CREATE TABLE arch.db.t (pk BIGINT, ts INT, v STRING)
                 USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    (0 to 5).foreach(i =>
      spark.sql(s"INSERT INTO arch.db.t VALUES (1, $i, 'v$i')"))
    spark.sql("CALL arch.system.clean('db.t', 2)") // cleanedUpTo = 4
    val n = spark.sql("CALL arch.system.archive_timeline('db.t')")
      .collect().head.getLong(0)
    assert(n == 4L, s"archived $n") // commits 0..3 (horizon cleanedUpTo-1)
    // the table keeps answering, and old VERSION AS OF refuses loud
    assert(spark.sql("SELECT v FROM arch.db.t").collect()
      .map(_.getString(0)).toSeq == Seq("v5"))
    val e = intercept[Exception](
      spark.sql("SELECT * FROM arch.db.t VERSION AS OF 1").collect())
    assert(e.getMessage.contains("archived"), e.getMessage)
  }
}
