package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import graft.lake.{CommitLog, LakeTable, LakeTableConfig}

/** Commit-log checkpoints (the Delta parquet-checkpoint role): a cold
  * reader resolves snapshots from the newest checkpoint plus the commit
  * tail — O(interval) metadata opens instead of O(timeline) — and the
  * results are BYTE-IDENTICAL to a full replay (order included), with
  * checkpoints as pure accelerators that rollback invalidates.
  */
class CheckpointSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def hconf = spark.sparkContext.hadoopConfiguration

  private def freshRoot(): String =
    Files.createTempDirectory("ckpttest").resolve("tbl").toString

  private def df(rows: (Long, String, Int)*): DataFrame = {
    import spark.implicits._
    rows.toDF("pk", "payload", "ts")
  }

  private def ckptFiles(root: String): Seq[String] = {
    val dir = new java.io.File(root, "_log")
    Option(dir.list()).map(_.toSeq).getOrElse(Seq.empty)
      .filter(_.startsWith("ckpt-")).sorted
  }

  /** n upsert commits after the seeding bulkInsert (ids 0..n) */
  private def mk(every: Int, n: Int = 9): LakeTable = {
    val t = LakeTable(spark, LakeTableConfig(freshRoot(),
      keyCols = Seq("pk"), precombineCol = "ts", checkpointEvery = every))
    t.bulkInsert(df((1L, "v0", 0)))
    (1 to n).foreach(i => t.upsert(df((i.toLong, s"v$i", i))))
    t
  }

  test("checkpoints appear on the configured cadence") {
    val t = mk(every = 4) // commits 0..9
    val cks = ckptFiles(t.config.root)
    // after c3 four commits accumulated (ckpt-3), after c7 four more
    assert(cks == Seq("ckpt-00000003.json", "ckpt-00000007.json"), cks)
    // disabled cadence writes none
    val t0 = mk(every = 0, n = 5)
    assert(ckptFiles(t0.config.root).isEmpty)
  }

  test("cold reader: checkpoint + tail, O(tail) commit opens, identical result") {
    val t = mk(every = 4) // ckpt-7, tail = {8, 9}
    val warmLive = t.log.liveFiles()
    val cold = new CommitLog(t.config.root, hconf)
    val coldLive = cold.liveFiles()
    // identical sequence, ORDER INCLUDED (the checkpoint stores replay order)
    assert(coldLive == warmLive)
    assert(cold.schemaJsonAsOf() == t.log.schemaJsonAsOf())
    // metadata I/O: 1 checkpoint + only the tail commits (8, 9)
    assert(cold.ckptOpens.get() == 1L, s"ckptOpens=${cold.ckptOpens.get()}")
    assert(cold.jsonOpens.get() <= 2L, s"jsonOpens=${cold.jsonOpens.get()}")
  }

  test("pure accelerator: deleting every checkpoint changes nothing") {
    val t = mk(every = 4)
    val withCk = new CommitLog(t.config.root, hconf)
    val expected = (withCk.liveFiles(), withCk.schemaJsonAsOf(),
      withCk.liveFiles(Some(5L)))
    ckptFiles(t.config.root).foreach { n =>
      assert(new java.io.File(new java.io.File(t.config.root, "_log"), n).delete())
    }
    val bare = new CommitLog(t.config.root, hconf)
    assert((bare.liveFiles(), bare.schemaJsonAsOf(),
      bare.liveFiles(Some(5L))) == expected)
    assert(bare.ckptOpens.get() == 0L)
  }

  test("time travel below, at, and above the checkpoint id") {
    val t = mk(every = 4) // ckpts at 3 and 7
    val bare = LakeTable(spark, LakeTableConfig(freshRoot(),
      keyCols = Seq("pk"), precombineCol = "ts", checkpointEvery = 0))
    bare.bulkInsert(df((1L, "v0", 0)))
    (1 to 9).foreach(i => bare.upsert(df((i.toLong, s"v$i", i))))
    for (id <- Seq(1L, 3L, 7L, 9L)) {
      assert(t.readAsOf(id).collect().toSet == bare.readAsOf(id).collect().toSet,
        s"asOf $id")
      // schema resolution at EXACTLY a checkpoint id exercises the
      // empty-tail branch (the checkpoint's own schemaJson answers)
      assert(t.log.schemaJsonAsOf(Some(id)) == bare.log.schemaJsonAsOf(Some(id)))
    }
  }

  test("rollback deletes covering checkpoints and the rolled adds vanish") {
    val t = mk(every = 5) // commits 0..9, ckpts at 4 and 9
    assert(ckptFiles(t.config.root).contains("ckpt-00000009.json"))
    t.rollback()
    // the checkpoint materializing the rolled commit is gone...
    assert(ckptFiles(t.config.root) == Seq("ckpt-00000004.json"))
    // ...and a cold reader resolves the retracted state correctly
    val cold = new CommitLog(t.config.root, hconf)
    assert(cold.liveFiles() == t.log.liveFiles())
    assert(!t.read().filter("payload = 'v9'").collect().exists(_ => true))
  }

  test("schema evolution across the checkpoint boundary reads correctly") {
    import org.apache.spark.sql.functions._
    val t = LakeTable(spark, LakeTableConfig(freshRoot(),
      keyCols = Seq("pk"), precombineCol = "ts", checkpointEvery = 3))
    t.bulkInsert(df((1L, "a", 0)))                                 // c0: 3 cols
    t.upsert(df((2L, "b", 0)).withColumn("extra", lit(7)))         // c1: widened
    t.upsert(df((3L, "c", 0)).withColumn("extra", lit(8)))         // c2 → ckpt-2
    t.upsert(df((4L, "d", 0)).withColumn("extra", lit(9)))         // c3
    // a FRESH LakeTable (new CommitLog) resolves per-file schemas through
    // the checkpoint: the pre-evolution file must null-backfill `extra`
    val t2 = LakeTable(spark, LakeTableConfig(t.config.root,
      keyCols = Seq("pk"), precombineCol = "ts", checkpointEvery = 3))
    val got = t2.read().select("pk", "payload", "extra").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1 else r.getInt(2))).toSet
    assert(got == Set((1L, "a", -1), (2L, "b", 7), (3L, "c", 8), (4L, "d", 9)))
    assert(ckptFiles(t.config.root).nonEmpty)
  }

  test("forceCheckpoint: off-cadence materialization, idempotent") {
    val t = mk(every = 0, n = 3)
    assert(ckptFiles(t.config.root).isEmpty)
    assert(t.log.forceCheckpoint().contains(3L))
    assert(ckptFiles(t.config.root) == Seq("ckpt-00000003.json"))
    assert(t.log.forceCheckpoint().contains(3L)) // same id: no-op
    val cold = new CommitLog(t.config.root, hconf)
    assert(cold.liveFiles() == t.log.liveFiles())
    assert(cold.jsonOpens.get() == 0L) // the head IS the checkpoint: zero commit opens
  }
}
